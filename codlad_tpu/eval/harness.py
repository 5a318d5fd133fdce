"""Inference + evaluation pipeline: latent sampling -> VQ snap -> IC decode
-> Cartesian rebuild -> metrics.

Replaces the reference's test.py driver loops (reference: test.py:253-889):
the whole sample->decode path is ONE jitted function per length bucket (the
reference runs 100 sequential model launches, then separate decode and
metric passes).

Experiments, mirroring `--experiment {recon,latent,genzprot}`:
  * recon: encoder latents (no sampling) -> VQ -> decode;
  * latent: diffusion/flow sampling conditioned on the CG trace;
  * genzprot: decode latents drawn from the CG prior.

The reference pushes a doubled batch through the sampler even at cfg 0.0
(test.py:504-535); `doubled_batch=True` reproduces that for parity runs,
False skips the redundant half (2x cheaper, identical first-half samples).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from codlad_tpu.eval import metrics as M
from codlad_tpu.gen.solvers import odeint
from codlad_tpu.geometry.internal import ic_to_xyz14
from codlad_tpu.models.vae import VAE
from codlad_tpu.models.vq import vq_quantize


@dataclasses.dataclass(eq=False)
class SamplingPipeline:
    denoiser: Any            # flax module
    denoiser_params: Any
    process: Any             # GaussianDiffusion or flow matcher kind
    process_kind: str        # 'diffusion' | flow names
    vae: VAE
    vae_params: Any
    vq_state: Any            # VQState / per-stage list (rvq, multihead) / None
    norm_mean: np.ndarray    # [latent_dim]
    norm_std: np.ndarray
    quantizer: Any = None    # models/vq.Quantizer; None -> plain EMA-VQ snap
    latent_size: int = 3
    doubled_batch: bool = False
    cfg_scale: float = 0.0
    ode_steps: int = 100
    ode_method: str = "euler"
    ode_rtol: float = 1e-5
    ode_atol: float = 1e-5
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for fast sampling
    sampler: str = "ancestral"  # diffusion only: 'ancestral' | 'ddim'
    ddim_eta: float = 0.0       # eta=0 deterministic; eta=1 ~ ancestral
    seq_shards: int = 0         # >0: shard the residue dim over the first
    #                             seq_shards devices (ring-kNN sequence
    #                             parallelism, parallel/sequence.py) — for
    #                             chains too long for one chip's HBM.
    #                             Requires L % seq_shards == 0.

    # All jitted functions take arrays as ARGUMENTS (never as closure
    # captures) — captured arrays would be inlined into the XLA program as
    # constants, ballooning compile time and memory.

    def _cast(self, tree):
        if self.compute_dtype is None:
            return tree
        cast = lambda v: (v.astype(self.compute_dtype)
                          if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
                          else v)
        return jax.tree.map(cast, tree)

    def _denoiser_cls(self):
        return type(self.denoiser)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _compute_condition(self, params, extras):
        cond = self.denoiser.apply(
            params, extras["res_type"], extras["cg_xyz"], extras["mask"],
            method=self._denoiser_cls().compute_condition)
        return self._cast(cond)

    # fuse_pairs=False everywhere: the round-4 layer-pair fusion measured
    # as a 5% REGRESSION on the sampling headline once isolated on an idle
    # chip (123.5 vs 130.1 steps/s, scripts/bench_fuse_ablation.py,
    # docs/DESIGN.md §15) — the split kernels are the production path.
    @functools.partial(jax.jit, static_argnums=(0,))
    def _sample_from_cond(self, rng, params, cond, noise):
        def model_fn(x, t, k, x_self_cond=None):
            xin = x if self.compute_dtype is None else x.astype(self.compute_dtype)
            out = self.denoiser.apply(params, xin, t, cond,
                                      x_self_cond=x_self_cond,
                                      deterministic=True,
                                      fuse_pairs=False,
                                      method=self._denoiser_cls().denoise)
            return out.astype(jnp.float32)

        return self._run_process(rng, model_fn, noise)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _sample_from_cond_cfg(self, rng, params, cond, uncond, noise,
                              cfg_scale):
        """Classifier-free guidance: cond and uncond evaluated on the SAME
        trajectory each step (one denoise over a condition-doubled batch),
        mean combined as uncond + s*(cond - uncond), variance channels from
        the conditioned branch.  Fixes the reference's broken cfg>1 path
        (test.py:525 calls an undefined forward_with_cfg) and avoids the
        DiT-style half-trajectory divergence (independently noised halves
        evaluate uncond off-trajectory)."""
        cond2 = jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0),
                             cond, uncond)

        def model_fn(x, t, k, x_self_cond=None):
            xin = x if self.compute_dtype is None else x.astype(self.compute_dtype)
            x2 = jnp.concatenate([xin, xin], 0)
            t2 = jnp.concatenate([t, t], 0)
            sc2 = (None if x_self_cond is None
                   else jnp.concatenate([x_self_cond, x_self_cond], 0))
            out = self.denoiser.apply(params, x2, t2, cond2,
                                      x_self_cond=sc2, deterministic=True,
                                      fuse_pairs=False,
                                      method=self._denoiser_cls().denoise
                                      ).astype(jnp.float32)
            c, u = out[:x.shape[0]], out[x.shape[0]:]
            C = self.latent_size
            mean = u[..., :C] + cfg_scale * (c[..., :C] - u[..., :C])
            return jnp.concatenate([mean, c[..., C:]], axis=-1)

        return self._run_process(rng, model_fn, noise)

    def _run_process(self, rng, model_fn, noise):
        if self.process_kind == "diffusion":
            if self.sampler == "ddim":
                return self.process.ddim_sample_loop(
                    rng, model_fn, noise.shape, noise=noise,
                    eta=self.ddim_eta, clip_denoised=False)
            return self.process.p_sample_loop(rng, model_fn, noise.shape,
                                              noise=noise, clip_denoised=False)
        f = lambda t, x: model_fn(x, jnp.full((noise.shape[0],), t), None)
        out, _ = odeint(f, noise, 0.0, 1.0, steps=self.ode_steps,
                        method=self.ode_method, rtol=self.ode_rtol,
                        atol=self.ode_atol)
        return out

    @functools.partial(jax.jit, static_argnums=(0,))
    def _sample_sharded(self, rng, params, res_type, cg_xyz, mask, noise):
        """Sequence-sharded sampling: conditioning AND the denoise scan run
        inside one shard_map over a 'seq' mesh — the O(L²) kNN is
        ring-streamed, [B, L, K, ·] edge tensors stay sharded, per-node
        tables all-gather (parallel/sequence.py).  Same params as dense.

        cfg_scale != 0 composes: the condition-doubled batch rides the
        (unsharded) batch dim, so guidance inside each shard is identical
        to the dense `_sample_from_cond_cfg` on that shard's rows."""
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        n = self.seq_shards
        mesh = Mesh(np.array(jax.devices()[:n]), ("seq",))
        model_sp = self.denoiser.clone(seq=("seq", n))
        cfg = float(self.cfg_scale or 0.0)

        def f(params, res, cg, m, noise, rng):
            # independent per-shard noise streams for the local rows
            rng = jax.random.fold_in(rng, jax.lax.axis_index("seq"))
            cond = model_sp.apply(params, res, cg, m,
                                  method=type(model_sp).compute_condition)
            cond = self._cast(cond)
            if cfg != 0.0:
                null_id = getattr(self.denoiser, "vocab", 30) - 1
                uncond = model_sp.apply(
                    params, jnp.full_like(res, null_id), cg, m,
                    method=type(model_sp).compute_condition)
                cond = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b], 0),
                    cond, self._cast(uncond))

            def model_fn(x, t, k, x_self_cond=None):
                xin = (x if self.compute_dtype is None
                       else x.astype(self.compute_dtype))
                if cfg != 0.0:
                    xin = jnp.concatenate([xin, xin], 0)
                    t = jnp.concatenate([t, t], 0)
                    if x_self_cond is not None:
                        x_self_cond = jnp.concatenate(
                            [x_self_cond, x_self_cond], 0)
                out = model_sp.apply(params, xin, t, cond,
                                     x_self_cond=x_self_cond,
                                     deterministic=True,
                                     method=type(model_sp).denoise
                                     ).astype(jnp.float32)
                if cfg != 0.0:
                    c, u = out[:x.shape[0]], out[x.shape[0]:]
                    C = self.latent_size
                    mean = u[..., :C] + cfg * (c[..., :C] - u[..., :C])
                    out = jnp.concatenate([mean, c[..., C:]], axis=-1)
                return out

            return self._run_process(rng, model_fn, noise)

        fn = shard_map(f, mesh=mesh,
                       in_specs=(P(), P(None, "seq"), P(None, "seq", None),
                                 P(None, "seq"), P(None, "seq", None), P()),
                       out_specs=P(None, "seq", None))
        return fn(params, res_type, cg_xyz, mask, noise, rng)

    def sample_latents(self, rng, extras, params=None):
        """Draw normalized latents [B, L, latent_size] given CG conditioning."""
        params = self.denoiser_params if params is None else params
        params = self._cast(params)
        B, L = extras["res_type"].shape
        rng, sub = jax.random.split(rng)
        z = jax.random.normal(sub, (B, L, self.latent_size))
        if self.seq_shards:
            if L % self.seq_shards:
                raise ValueError(
                    f"sequence length {L} must divide by seq_shards="
                    f"{self.seq_shards} (pick a compatible padding bucket)")
            if self.doubled_batch and not self.cfg_scale:
                # the doubled batch rides the UNSHARDED batch dim.  Same
                # precedence as the dense path below: cfg != 0 already
                # doubles the batch inside the shard_map for guidance, so
                # doubling here too would run the denoiser on 4B rows.
                extras = {k: jnp.concatenate([v, v], 0)
                          for k, v in extras.items()}
                z = jnp.concatenate([z, z], 0)
            return self._sample_sharded(rng, params, extras["res_type"],
                                        extras["cg_xyz"], extras["mask"],
                                        z)[:B]
        if self.cfg_scale and self.cfg_scale != 0.0:
            # guidance's unconditional surrogate: the NULL residue token
            # (vocab-1), the id --class_dropout_prob trains for exactly
            # this role (structural CG conditioning is kept)
            null_id = getattr(self.denoiser, "vocab", 30) - 1
            cond = self._compute_condition(params, extras)
            uncond_extras = dict(extras,
                                 res_type=jnp.full_like(extras["res_type"],
                                                        null_id))
            uncond = self._compute_condition(params, uncond_extras)
            return self._sample_from_cond_cfg(
                rng, params, cond, uncond, z,
                jnp.float32(self.cfg_scale))[:B]
        if self.doubled_batch:
            # reference pushes a doubled batch even at cfg 0.0
            # (test.py:504-535); halves are identical
            extras = {k: jnp.concatenate([v, v], 0) for k, v in extras.items()}
            z = jnp.concatenate([z, z], 0)
        cond = self._compute_condition(params, extras)
        out = self._sample_from_cond(rng, params, cond, z)
        return out[:B]

    @functools.partial(jax.jit, static_argnums=(0,))
    def _decode(self, vae_params, vq_state, batch, latents_norm, norm):
        mean, std = norm
        latents = latents_norm * std + mean
        if vq_state is not None:
            if self.quantizer is not None:
                latents, _, _, _ = self.quantizer.quantize(
                    vq_state, latents, batch["res_mask"], train=False)
            else:
                latents, _, _, _ = vq_quantize(vq_state, latents,
                                               batch["res_mask"], train=False)
        ic_recon = self.vae.apply(vae_params, batch, latents, method=VAE.decode)
        xyz14 = ic_to_xyz14(batch["cg_xyz_og"], ic_recon, batch["res_type"])
        return ic_recon, xyz14

    def decode(self, batch, latents_norm):
        """De-normalize, snap to the codebook, decode to ic + coordinates
        (reference test.py:548-582 + vae_model.py:830-838)."""
        norm = (jnp.asarray(self.norm_mean, jnp.float32),
                jnp.asarray(self.norm_std, jnp.float32))
        return self._decode(self.vae_params, self.vq_state, batch,
                            latents_norm, norm)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _encode(self, vae_params, batch):
        h, _ = self.vae.apply(vae_params, batch, method=VAE.encode)
        return h

    def encode_latents(self, batch):
        """--experiment recon path: pre-VQ encoder latents."""
        return self._encode(self.vae_params, batch)

    def sample_and_decode(self, rng, batch):
        """The benchmark path: conditioning -> latents -> structure."""
        extras = {
            "res_type": batch["res_type"],
            "cg_xyz": batch["cg_xyz_og"][:, 1:-1],
            "mask": batch["res_mask"],
        }
        lat = self.sample_latents(rng, extras)
        return self.decode(batch, lat)


def evaluate_structures(batch, ic_recon, xyz14_gen):
    """Full per-batch metric set (reference test.py:589-676)."""
    keep = (~batch["endpoint_mask"])[..., None] & batch["atom_mask"]
    xyz_gen = jnp.where(keep[..., None], xyz14_gen, 0.0)
    xyz_ref = jnp.where(keep[..., None], batch["xyz14"], 0.0)
    B = xyz_gen.shape[0]
    flat_gen, flat_ref = xyz_gen.reshape(B, -1, 3), xyz_ref.reshape(B, -1, 3)
    flat_mask = keep.reshape(B, -1)

    bond, angle, torsion = _recon_terms(batch, ic_recon)
    out = {
        "rmsd": M.unaligned_rmsd(flat_gen, flat_ref, flat_mask).mean(),
        "rmsd_aligned": M.kabsch_rmsd(flat_ref, flat_gen, flat_mask).mean(),
        "ged": M.ged_score(xyz_gen, xyz_ref, batch["bond_edges"], batch["bond_edges_mask"]),
        "clash": M.clash_ratio(xyz_gen, batch["clash_edges"], batch["clash_edges_mask"],
                               batch["bb_no_edges"], batch["bb_no_edges_mask"]),
        "inter": M.interaction_scores(xyz_gen, batch["inter_edges"],
                                      batch["inter_edges_mask"],
                                      batch["pipi_pairs"], batch["pipi_pairs_mask"])[0],
        "xyz": _xyz_loss(batch, xyz_gen, xyz_ref),
        "bond": bond, "angle": angle, "torsion": torsion,
    }
    valid, ratio = M.graph_validity(xyz_gen, xyz_ref, batch["res_type"], keep)
    out["graph_valid_ratio"] = valid.mean()
    out["graph_diff_ratio"] = ratio.mean()
    return out


def _xyz_loss(batch, xyz_gen, xyz_ref):
    m = batch["atom_mask"].astype(xyz_gen.dtype)
    sq = ((xyz_gen - xyz_ref) ** 2).sum(-1)
    return (sq * m).sum() / jnp.maximum(m.sum(), 1.0)


def _recon_terms(batch, ic_recon):
    ic = batch["ic"]
    m = batch["ic_mask"].astype(ic.dtype)
    n = jnp.maximum(m.sum(), 1.0)
    eps = 1e-7
    bond = ((((ic_recon[..., 0] - ic[..., 0]) * m) ** 2).sum()) / n
    angle = (jnp.sqrt(2 * (1 - jnp.cos(ic[..., 1] - ic_recon[..., 1])) + eps) * m).sum() / n
    torsion = (jnp.sqrt(2 * (1 - jnp.cos(ic[..., 2] - ic_recon[..., 2])) + eps) * m).sum() / n
    return bond, angle, torsion


def run_ensemble(pipeline: SamplingPipeline, batch, num_ensemble, seed=0,
                 sample_fn=None, return_structures=False, log_fn=None,
                 fold=1):
    """Generate an ensemble, collect per-sample metrics + DIV (reference
    test.py:455-710 loops).

    sample_fn(rng, batch) -> (ic_recon, xyz14) overrides the pipeline's
    sample_and_decode (e.g. the GenZProt prior path).  The returned agg
    carries the ensemble mean per metric plus `per_ensemble` — the
    per-sample metric dicts the reference prints per ensemble member
    (test.py:656-676).  With return_structures=True, also returns the
    generated xyz14 stack [S, B, L, 14, 3] for artifact export
    (reference dumps xtc/pdb per protein, test.py:787-816).

    fold > 1 generates that many ensemble members PER SAMPLER CALL by
    tiling the batch along axis 0 — per-protein eval batches are small
    (a handful of frames), so the sequential member loop leaves the chip
    mostly idle; folding fills it.  Members drawn folded use different
    (iid) noise streams than the sequential path, so results are
    statistically — not bitwise — identical across fold settings."""
    sample_fn = sample_fn or pipeline.sample_and_decode
    B = batch["res_type"].shape[0]
    gens = []
    structures = []
    per_sample = []
    s = 0
    while s < num_ensemble:
        f = min(max(int(fold), 1), num_ensemble - s)
        if f == 1:
            rng = jax.random.PRNGKey(seed + s)
            chunks = [sample_fn(rng, batch)]
        else:
            big = {k: jnp.concatenate([v] * f, axis=0) for k, v in batch.items()}
            rng = jax.random.fold_in(jax.random.PRNGKey(seed), s)
            ic_f, xyz_f = sample_fn(rng, big)
            chunks = [(ic_f[i * B:(i + 1) * B], xyz_f[i * B:(i + 1) * B])
                      for i in range(f)]
        for ic_recon, xyz14 in chunks:
            m = {k: float(v) for k, v in
                 evaluate_structures(batch, ic_recon, xyz14).items()}
            per_sample.append(m)
            if log_fn is not None:
                log_fn(len(per_sample) - 1, m)
            keep = (~batch["endpoint_mask"])[..., None] & batch["atom_mask"]
            gens.append(jnp.where(keep[..., None], xyz14, 0.0)
                        .reshape(xyz14.shape[0], -1, 3))
            if return_structures:
                structures.append(np.asarray(xyz14))
        s += f
    keep = (~batch["endpoint_mask"])[..., None] & batch["atom_mask"]
    flat_mask = keep.reshape(keep.shape[0], -1)
    ref = jnp.where(keep[..., None], batch["xyz14"], 0.0).reshape(flat_mask.shape + (3,))
    div, rmsd_ref, rmsd_gen = M.diversity(jnp.stack(gens), ref, flat_mask)
    agg = {k: float(np.mean([m[k] for m in per_sample])) for k in per_sample[0]}
    agg.update(div=float(div), rmsd_ref_ens=float(rmsd_ref),
               rmsd_gen_ens=float(rmsd_gen))
    agg["per_ensemble"] = per_sample
    if return_structures:
        return agg, np.stack(structures)
    return agg
