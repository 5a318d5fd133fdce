"""Jitted train/eval steps for both stages.

Each step is a pure function (state, batch, rng, ...) -> (state, metrics)
designed to be jitted once per length bucket and sharded over the 'data'
mesh axis: gradients, VQ statistics, and metric reductions all become
global XLA collectives automatically under batch sharding.

Faithfulness notes:
  * gradient clipping 5.0 for Stage 1 / args.grad_clip (1.0) for Stage 2
    lives inside the optax chain (reference train_module.py:421,
    train_latent.py:252);
  * the reference SKIPS the optimizer step when loss >= 50 or NaN
    (train_module.py:413-415) — here bad batches zero the gradients
    instead (the optimizer state still sees a zero update, which keeps the
    step jit-able);
  * Stage-2 EMA decay 0.9999 (train_module.py:101-111).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from codlad_tpu.models.vae import VAE, GenZProt, reparametrize
from codlad_tpu.models.vq import vq_quantize
from codlad_tpu.train.losses import (
    LossWeights,
    kl_gaussians,
    kl_standard_normal,
    vqvae_loss_terms,
)
from codlad_tpu.train.state import TrainState, update_ema


def weights_to_array(w: LossWeights):
    return jnp.array([w.beta, w.delta, w.eta, w.zeta, w.omega, w.theta],
                     jnp.float32)


def _weights_from_array(a):
    return LossWeights(beta=a[0], delta=a[1], eta=a[2], zeta=a[3],
                       omega=a[4], theta=a[5])


def vq_codebook_metrics(idx, mask, n_codes):
    """Codebook-health telemetry: perplexity exp(H(p)) of the batch's code
    distribution and the fraction of codes hit at least once.  Perplexity
    near 1 = codebook collapse; near n_codes = uniform usage.  (The
    reference only surfaces a usage histogram OFFLINE after extraction,
    extract_features.py:23-53,289-290 — this makes the same signal a
    per-epoch training metric so a val stall can be attributed to codebook
    collapse while the run is still live.)"""
    idx = jnp.asarray(idx).reshape(-1)
    w = jnp.ones(idx.shape, jnp.float32)
    if mask is not None:
        m = mask.reshape(-1).astype(jnp.float32)
        if m.size == idx.size:
            w = m
        elif idx.size % m.size == 0:  # multihead/rvq: extra trailing dims
            w = jnp.repeat(m, idx.size // m.size)
    counts = jnp.zeros((n_codes,), jnp.float32).at[idx].add(w)
    p = counts / jnp.maximum(counts.sum(), 1.0)
    perplexity = jnp.exp(-jnp.sum(jnp.where(p > 0, p * jnp.log(
        jnp.maximum(p, 1e-30)), 0.0)))
    usage = (counts > 0).mean()
    return perplexity, usage


def make_vqvae_step(vae: VAE, *, vq_decay=0.99, commitment_weight=0.25,
                    skip_loss_threshold=50.0, quantizer=None):
    """Returns train_step(state, batch, rng, weights_arr) and
    eval_step(state, batch, rng, weights_arr).

    `quantizer` (models/vq.Quantizer) selects the VQ variant — the
    reference's build_quantize dispatch (utils/vq_module.py:98-163);
    None = plain EMA VQ."""

    mode = vae.mode

    def forward(params, vq_state, batch, rng, weights, train):
        from codlad_tpu.data.batch import decompress_indices
        batch = decompress_indices(batch)
        w = weights
        h, (mu, sigma) = vae.apply(params, batch, method=VAE.encode)
        mask = batch["res_mask"]
        new_vq = vq_state
        vq_loss = 0.0
        kl = 0.0
        vq_health = {}
        if mode == "vqvae":
            if quantizer is not None:
                zq, idx, vq_loss, new_vq = quantizer.quantize(
                    vq_state, h, mask, train=train,
                    rng=jax.random.fold_in(rng, 4096))
                n_codes = quantizer.codebook_size
            else:
                zq, idx, vq_loss, new_vq = vq_quantize(
                    vq_state, h, mask, train=train, decay=vq_decay,
                    commitment_weight=commitment_weight)
                n_codes = vq_state.codebook.shape[0]
            try:
                perpl, usage = vq_codebook_metrics(idx, mask, n_codes)
                vq_health = {"vq_perplexity": perpl, "vq_usage": usage}
            except (TypeError, ValueError):
                pass  # exotic index layouts (rvq stage lists): skip telemetry
        elif mode in ("fgvae", "cgvae"):
            zq = reparametrize(rng, mu, sigma) if train else mu
            kl = kl_standard_normal(mu, sigma, mask)
        else:  # fgae
            zq = h
        ic_recon = vae.apply(params, batch, zq, method=VAE.decode)
        recon, metrics = vqvae_loss_terms(batch, ic_recon, w)
        loss = recon + vq_loss + w.beta * kl
        metrics = dict(metrics, vq=vq_loss, kl=kl, loss=loss, **vq_health)
        return loss, (metrics, new_vq)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng, weights_arr):
        w = _weights_from_array(weights_arr)

        def loss_fn(params):
            return forward(params, state.vq_state, batch, rng, w, True)

        (loss, (metrics, new_vq)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        good = jnp.isfinite(loss) & (loss < skip_loss_threshold)
        grads = jax.tree.map(lambda g: jnp.where(good, g, 0.0), grads)
        cand = state.apply_gradients(grads)
        cand = cand.replace(vq_state=new_vq)
        # skipped batch == the step never happened (reference skips
        # optimizer.step() outright, train_module.py:413-415): zero grads
        # alone still move params through Adam's momentum decay, so select
        # the WHOLE state — params, opt state, step counter, VQ state
        new_state = jax.tree.map(lambda n, o: jnp.where(good, n, o),
                                 cand, state)
        metrics["skipped"] = 1.0 - good.astype(jnp.float32)
        return new_state, metrics

    @jax.jit
    def eval_step(state: TrainState, batch, rng, weights_arr):
        w = _weights_from_array(weights_arr)
        _, (metrics, _) = forward(state.params, state.vq_state, batch, rng, w, False)
        return metrics

    return train_step, eval_step


def make_genzprot_step(model: GenZProt, *, beta=0.05, max_kl_free=0.01,
                       skip_loss_threshold=50.0):
    """GenZProt (prior-VAE) steps: recon + hinge KL(posterior || CG prior)
    (reference train_module.py:222-225)."""

    def forward(params, batch, rng, weights, train):
        from codlad_tpu.data.batch import decompress_indices
        batch = decompress_indices(batch)
        mu, sigma, pmu, psigma, ic_recon = model.apply(
            params, batch, rng=rng if train else None)
        recon, metrics = vqvae_loss_terms(batch, ic_recon, weights)
        kl = kl_gaussians(mu, sigma, pmu, psigma, batch["res_mask"])
        kl = jnp.maximum(kl - max_kl_free, 0.0)
        loss = recon + beta * kl
        return loss, dict(metrics, kl=kl, loss=loss)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng, weights_arr):
        w = _weights_from_array(weights_arr)
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: forward(p, batch, rng, w, True), has_aux=True)(state.params)
        good = jnp.isfinite(loss) & (loss < skip_loss_threshold)
        grads = jax.tree.map(lambda g: jnp.where(good, g, 0.0), grads)
        cand = state.apply_gradients(grads)
        # see make_vqvae_step: skipped == the step never happened
        new_state = jax.tree.map(lambda n, o: jnp.where(good, n, o),
                                 cand, state)
        metrics["skipped"] = 1.0 - good.astype(jnp.float32)
        return new_state, metrics

    @jax.jit
    def eval_step(state: TrainState, batch, rng, weights_arr):
        w = _weights_from_array(weights_arr)
        _, metrics = forward(state.params, batch, rng, w, False)
        return metrics

    return train_step, eval_step


def apply_class_dropout(rng, res_type, p, null_id):
    """Classifier-free-guidance training: with probability p, a sample's
    WHOLE residue-type sequence is replaced by the null token, so the model
    learns a genuine unconditional-sequence predictor (the reference ships
    class_dropout 0 and an undefined forward_with_cfg — test.py:525;
    this finishes the job: DiT-style label dropout adapted to per-residue
    sequence conditioning)."""
    drop = jax.random.bernoulli(rng, p, (res_type.shape[0],))
    return jnp.where(drop[:, None], jnp.full_like(res_type, null_id), res_type)


def masked_l2(pred, target, mask):
    """Reference loss_fn 'l2': masked mean of squared error
    (train_module.py:27-56)."""
    m = jnp.broadcast_to(mask[..., None], pred.shape).astype(pred.dtype)
    return jnp.sum((pred - target) ** 2 * m) / jnp.maximum(m.sum(), 1.0)


def make_latent_step(denoiser, process, *, process_kind: str,
                     ema_decay=0.9999, dropout=True, compute_dtype=None,
                     class_dropout_prob=0.0, seq_mesh=None):
    """Stage-2 steps. process_kind: 'diffusion' | one of the flow names |
    'backbone'. `process` is the GaussianDiffusion or flow matcher.

    compute_dtype='bfloat16': mixed precision — the network forward runs
    in bf16 (activations AND a bf16 view of the params; grads accumulate
    back through the cast into the f32 master params), while the
    q-sample/VB/MSE diffusion math stays f32. Halves the [B, L, K, H]
    message-tensor traffic that dominates the train step.

    class_dropout_prob > 0 trains the cfg unconditional branch: whole
    sequences are replaced by the null residue token (vocab-1) with that
    probability (see apply_class_dropout).

    seq_mesh=(mesh, n_shards): TRAIN with the residue dimension sharded
    over the mesh's 'seq' axis (ring-kNN sequence parallelism,
    parallel/sequence.py) — chains too long for one chip's HBM train the
    SAME parameter pytree as the dense model.  The network forward/backward
    runs inside a shard_map (params replicated — their grads psum over the
    whole mesh in the transpose); the diffusion q-sample/VB math outside
    stays on global arrays, where GSPMD shards it.  A 2-D ('data', 'seq')
    mesh composes dp x sp; dropout keys fold in every mesh axis index so
    shards draw independent masks."""
    null_id = getattr(denoiser, "vocab", 30) - 1

    if seq_mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        _mesh, _n_sp = seq_mesh
        _sp_model = denoiser.clone(seq=("seq", _n_sp))
        _b_axis = "data" if "data" in _mesh.axis_names else None
        _x_spec = P(_b_axis, "seq", None)
        _self_cond = getattr(denoiser, "self_condition", False)

        def _net(params, x, t, res, cg, m, rng, use_dropout, x_self_cond):
            def f(params, x, t, res, cg, m, rng, x_self_cond):
                k = rng
                for ax in _mesh.axis_names:
                    k = jax.random.fold_in(k, jax.lax.axis_index(ax))
                return _sp_model.apply(
                    params, x, t, res, cg, m,
                    x_self_cond=(x_self_cond if _self_cond else None),
                    deterministic=not use_dropout,
                    rngs={"dropout": k} if use_dropout else None)

            fn = shard_map(
                f, mesh=_mesh,
                in_specs=(P(), _x_spec, P(_b_axis), P(_b_axis, "seq"),
                          _x_spec, P(_b_axis, "seq"), P(), _x_spec),
                out_specs=_x_spec)
            # shard_map takes no literal None operands: self-conditioning
            # off -> feed zeros the body ignores
            sc = x_self_cond if x_self_cond is not None else jnp.zeros_like(x)
            return fn(params, x, t, res, cg, m, rng, sc)
    else:
        def _net(params, x, t, res, cg, m, rng, use_dropout, x_self_cond):
            return denoiser.apply(
                params, x, t, res, cg, m, x_self_cond=x_self_cond,
                deterministic=not use_dropout,
                rngs={"dropout": rng} if use_dropout else None)

    def model_apply(params, x, t, rng, extras, x_self_cond=None, train=True):
        use_dropout = dropout and train
        if class_dropout_prob > 0 and train:
            k_cls = jax.random.fold_in(rng, 0xC1A55)
            extras = dict(extras, res_type=apply_class_dropout(
                k_cls, extras["res_type"], class_dropout_prob, null_id))
        if compute_dtype is not None:
            cast = lambda v: (v.astype(compute_dtype)
                              if hasattr(v, "dtype")
                              and jnp.issubdtype(v.dtype, jnp.floating) else v)
            params = jax.tree.map(cast, params)
            x = cast(x)
            extras = dict(extras, cg_xyz=cast(extras["cg_xyz"]))
            if x_self_cond is not None:
                x_self_cond = cast(x_self_cond)
        out = _net(params, x, t, extras["res_type"], extras["cg_xyz"],
                   extras["mask"], rng, use_dropout, x_self_cond)
        return out.astype(jnp.float32)

    def loss_fn(params, x1, extras, rng, train=True, t=None, t_weights=None):
        mask3 = extras["mask"][..., None]
        # batch-padding rows (compile-stable tail batches, per-host stripe
        # padding) carry all-zero masks: normalize by the VALID sample
        # count so they don't dilute the mean (the reference's smaller
        # true partial batches have the same semantics, train_latent.py:249)
        valid = jnp.any(extras["mask"], axis=tuple(range(1, extras["mask"].ndim))
                        ).astype(jnp.float32)
        n_valid = jnp.maximum(valid.sum(), 1.0)
        if process_kind == "diffusion":
            k_t, k_loss = jax.random.split(rng)
            if t is None:
                t = jax.random.randint(k_t, (x1.shape[0],), 0,
                                       process.num_timesteps)
            model_fn = lambda x, tt, k, x_self_cond=None: model_apply(
                params, x, tt, k, extras, x_self_cond, train=train)
            terms = process.training_losses(k_loss, model_fn, x1, t, mask=mask3)
            per_sample = terms["loss"] * valid
            if t_weights is not None:
                loss = (per_sample * t_weights).sum() / n_valid
            else:
                loss = per_sample.sum() / n_valid
            return loss, {"mse": (terms["mse"] * valid).sum() / n_valid,
                          "loss_per_sample": per_sample, "t": t,
                          "valid_mask": valid, "weight": n_valid}
        # flow/backbone losses are masked-token means (masked_l2): padded
        # samples contribute zero to BOTH numerator and denominator, so
        # they are already tail-exact; `weight` = token count for
        # validation aggregation across unevenly-padded batches
        token_w = extras["mask"].sum().astype(jnp.float32)
        if process_kind == "backbone":
            k_x0, k_drop = jax.random.split(rng)
            x0 = jax.random.normal(k_x0, x1.shape)
            t = jnp.ones((x1.shape[0],), x1.dtype)
            vt = model_apply(params, x0, t, k_drop, extras, train=train)
            loss = masked_l2(vt, x1, extras["mask"])
            return loss, {"weight": token_w}
        # flow matching
        k_x0, k_fm, k_drop = jax.random.split(rng, 3)
        x0 = jax.random.normal(k_x0, x1.shape)
        if process_kind == "sbcfm":
            t, xt, ut, eps = process.sample_location_and_conditional_flow(
                k_fm, x0, x1, return_noise=True)
            # sbcfm needs a score head: configure the denoiser with twice
            # the output width and split (the reference's tensor unpacking
            # here only worked for its DiT backbone; train_latent.py:222)
            out = model_apply(params, xt, t, k_drop, extras, train=train)
            vt, st = jnp.split(out, 2, axis=-1)
            lambda_t = process.compute_lambda(t)
            loss = masked_l2(vt, ut, extras["mask"])
            score_loss = jnp.mean((lambda_t[:, None, None] * st + eps) ** 2)
            return loss + score_loss, {"score": score_loss, "weight": token_w}
        t, xt, ut = process.sample_location_and_conditional_flow(k_fm, x0, x1)
        vt = model_apply(params, xt, t, k_drop, extras, train=train)
        return masked_l2(vt, ut, extras["mask"]), {"weight": token_w}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x1, extras, rng, t=None, t_weights=None):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: loss_fn(p, x1, extras, rng, t=t, t_weights=t_weights),
            has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        new_state = new_state.replace(
            ema_params=update_ema(new_state.ema_params, new_state.params,
                                  ema_decay))
        gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads)))
        return new_state, dict(aux, loss=loss, grad_norm=gnorm)

    @jax.jit
    def eval_step(state: TrainState, x1, extras, rng):
        loss, aux = loss_fn(state.params, x1, extras, rng, train=False)
        return dict(aux, loss=loss)

    return train_step, eval_step


def make_distill_step(denoiser, teacher_process, student_process, *,
                      ema_decay=0.9999, compute_dtype=None):
    """Progressive-distillation steps (gen/distill.py): the student (the
    trained state) learns to match two frozen-teacher DDIM steps in one.
    Same mesh/bf16/valid-sample-weighting contract as make_latent_step;
    dropout is OFF on both branches (the teacher is evaluated exactly as
    at sampling time, and the student distills that deterministic map)."""
    from codlad_tpu.gen.distill import distill_loss_terms

    def model_apply(params, x, t, rng, extras):
        if compute_dtype is not None:
            cast = lambda v: (v.astype(compute_dtype)
                              if hasattr(v, "dtype")
                              and jnp.issubdtype(v.dtype, jnp.floating) else v)
            params = jax.tree.map(cast, params)
            x = cast(x)
            extras = dict(extras, cg_xyz=cast(extras["cg_xyz"]))
        out = denoiser.apply(
            params, x, t, extras["res_type"], extras["cg_xyz"],
            extras["mask"], deterministic=True)
        return out.astype(jnp.float32)

    def loss_fn(params, teacher_params, x1, extras, rng, train=True):
        mask3 = extras["mask"][..., None]
        valid = jnp.any(extras["mask"],
                        axis=tuple(range(1, extras["mask"].ndim))
                        ).astype(jnp.float32)
        n_valid = jnp.maximum(valid.sum(), 1.0)
        k_t, k_loss = jax.random.split(rng)
        i_s = jax.random.randint(k_t, (x1.shape[0],), 0,
                                 student_process.num_timesteps)
        teacher_fn = lambda x, tt, k: model_apply(
            jax.lax.stop_gradient(teacher_params), x, tt, k, extras)
        student_fn = lambda x, tt, k: model_apply(params, x, tt, k, extras)
        terms = distill_loss_terms(teacher_process, student_process,
                                   teacher_fn, student_fn, k_loss, x1, i_s,
                                   mask=mask3)
        loss = (terms["loss"] * valid).sum() / n_valid
        return loss, {"mse": (terms["mse"] * valid).sum() / n_valid,
                      "weight": n_valid}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, teacher_params, x1, extras, rng):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: loss_fn(p, teacher_params, x1, extras, rng),
            has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        new_state = new_state.replace(
            ema_params=update_ema(new_state.ema_params, new_state.params,
                                  ema_decay))
        gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads)))
        return new_state, dict(aux, loss=loss, grad_norm=gnorm)

    @jax.jit
    def eval_step(state: TrainState, teacher_params, x1, extras, rng):
        loss, aux = loss_fn(state.params, teacher_params, x1, extras, rng,
                            train=False)
        return dict(aux, loss=loss)

    return train_step, eval_step
