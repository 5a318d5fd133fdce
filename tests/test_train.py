"""Training-step integration tests, incl. data-parallel sharding on the
virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from codlad_tpu.data import batch as B
from codlad_tpu.data.synthetic import synthetic_examples
from codlad_tpu.gen.diffusion import create_diffusion
from codlad_tpu.gen.flow import FLOW_MATCHERS
from codlad_tpu.models.denoiser import mpnn_diffusion
from codlad_tpu.models.vae import VAE
from codlad_tpu.models.vq import vq_init
from codlad_tpu.train import mesh as mesh_mod
from codlad_tpu.train.losses import LossWeights
from codlad_tpu.train.state import create_train_state
from codlad_tpu.train.steps import (
    make_latent_step,
    make_vqvae_step,
    weights_to_array,
)


@pytest.fixture(scope="module")
def tiny_batch():
    exs = synthetic_examples(4, 14, seed=0)
    spec = B.spec_for(exs, length_multiple=4, edge_multiple=64)
    return {k: jnp.asarray(v) for k, v in B.collate(exs, spec).items()}


@pytest.mark.slow
def test_vqvae_train_step_decreases_loss(tiny_batch):
    vae = VAE(embed_dim=36, vqdim=3, mode="vqvae", dec_nconv=2, enc_nconv=2)
    rng = jax.random.PRNGKey(0)
    params = vae.init(rng, tiny_batch)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    state = create_train_state(params, tx, vq_state=vq_init(rng, 64, 3))
    train_step, eval_step = make_vqvae_step(vae)

    w = weights_to_array(LossWeights(eta=1.0, zeta=0.0))
    losses = []
    for i in range(8):
        state, metrics = train_step(state, tiny_batch, jax.random.PRNGKey(i), w)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # eval runs and returns the same metric keys
    m = eval_step(state, tiny_batch, rng, w)
    assert set(m) >= {"bond", "angle", "torsion", "xyz", "graph", "clash", "loss"}


@pytest.mark.slow
def test_latent_diffusion_step_and_dp_mesh(tiny_batch):
    model = mpnn_diffusion(input_size=3, learn_sigma=True, k_neighbors=8,
                           dropout=0.1)
    diffusion = create_diffusion(None, diffusion_steps=100, learn_sigma=True)

    Bsz, L = tiny_batch["res_type"].shape
    extras = {
        "res_type": tiny_batch["res_type"],
        "cg_xyz": tiny_batch["cg_xyz_og"][:, 1:-1],
        "mask": tiny_batch["res_mask"],
    }
    x1 = jax.random.normal(jax.random.PRNGKey(0), (Bsz, L, 3))
    params = model.init(jax.random.PRNGKey(1), x1, jnp.zeros((Bsz,), jnp.int32),
                        extras["res_type"], extras["cg_xyz"], extras["mask"])
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
    state = create_train_state(params, tx, with_ema=True)
    train_step, eval_step = make_latent_step(model, diffusion,
                                             process_kind="diffusion")

    # ---- data-parallel over the 8-device CPU mesh
    mesh = mesh_mod.make_mesh(8)
    hb = {k: np.asarray(v) for k, v in extras.items()}
    hb["x1"] = np.asarray(x1)
    hb = mesh_mod.pad_batch_to_devices(hb, 8)
    sharded = mesh_mod.shard_batch(hb, mesh)
    state = mesh_mod.replicate(state, mesh)

    x1_s = sharded.pop("x1")
    losses = []
    for i in range(4):
        state, metrics = train_step(state, x1_s, sharded, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # EMA params moved
    d = jax.tree.leaves(jax.tree.map(lambda a, b: jnp.abs(a - b).max(),
                                     state.params, state.ema_params))
    assert max(float(x) for x in d) > 0

    m = eval_step(state, x1_s, sharded, jax.random.PRNGKey(99))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.parametrize("kind", ["icfm", "fm", "vpfm", "otcfm"])
@pytest.mark.slow
def test_latent_flow_steps(tiny_batch, kind):
    model = mpnn_diffusion(input_size=3, learn_sigma=False, k_neighbors=8,
                           dropout=0.0)
    fm = FLOW_MATCHERS[kind]()
    Bsz, L = tiny_batch["res_type"].shape
    extras = {
        "res_type": tiny_batch["res_type"],
        "cg_xyz": tiny_batch["cg_xyz_og"][:, 1:-1],
        "mask": tiny_batch["res_mask"],
    }
    x1 = jax.random.normal(jax.random.PRNGKey(0), (Bsz, L, 3))
    params = model.init(jax.random.PRNGKey(1), x1, jnp.zeros((Bsz,)),
                        extras["res_type"], extras["cg_xyz"], extras["mask"])
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
    state = create_train_state(params, tx, with_ema=True)
    train_step, _ = make_latent_step(model, fm, process_kind=kind, dropout=False)
    state, metrics = train_step(state, x1, extras, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_sbcfm_step(tiny_batch):
    # sbcfm needs the doubled output head (velocity + score)
    model = mpnn_diffusion(input_size=3, learn_sigma=True, k_neighbors=8,
                           dropout=0.0)
    fm = FLOW_MATCHERS["sbcfm"](sigma=1.0, ot_method="sinkhorn")
    Bsz, L = tiny_batch["res_type"].shape
    extras = {
        "res_type": tiny_batch["res_type"],
        "cg_xyz": tiny_batch["cg_xyz_og"][:, 1:-1],
        "mask": tiny_batch["res_mask"],
    }
    x1 = jax.random.normal(jax.random.PRNGKey(0), (Bsz, L, 3))
    params = model.init(jax.random.PRNGKey(1), x1, jnp.zeros((Bsz,)),
                        extras["res_type"], extras["cg_xyz"], extras["mask"])
    tx = optax.adamw(3e-4)
    state = create_train_state(params, tx, with_ema=True)
    train_step, _ = make_latent_step(model, fm, process_kind="sbcfm", dropout=False)
    state, metrics = train_step(state, x1, extras, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert "score" in metrics


@pytest.mark.slow
def test_latent_step_with_loss_resampler(tiny_batch):
    """Loss-second-moment t sampling wired through the train step."""
    from codlad_tpu.gen.timestep_sampler import LossSecondMomentResampler

    model = mpnn_diffusion(input_size=3, learn_sigma=True, k_neighbors=8,
                           dropout=0.0)
    diffusion = create_diffusion(None, diffusion_steps=50, learn_sigma=True)
    Bsz, L = tiny_batch["res_type"].shape
    extras = {
        "res_type": tiny_batch["res_type"],
        "cg_xyz": tiny_batch["cg_xyz_og"][:, 1:-1],
        "mask": tiny_batch["res_mask"],
    }
    x1 = jax.random.normal(jax.random.PRNGKey(0), (Bsz, L, 3))
    params = model.init(jax.random.PRNGKey(1), x1, jnp.zeros((Bsz,), jnp.int32),
                        extras["res_type"], extras["cg_xyz"], extras["mask"])
    tx = optax.adamw(3e-4)
    state = create_train_state(params, tx, with_ema=True)
    train_step, _ = make_latent_step(model, diffusion, process_kind="diffusion",
                                     dropout=False)
    rs = LossSecondMomentResampler(50, history_per_term=2)
    for i in range(3):
        t, w = rs.sample(jax.random.PRNGKey(i), Bsz)
        state, m = train_step(state, x1, extras, jax.random.PRNGKey(10 + i),
                              t=t, t_weights=w)
        rs.update_with_losses(np.asarray(m["t"]), np.asarray(m["loss_per_sample"]))
    assert np.isfinite(float(m["loss"]))
    assert rs._loss_counts.sum() > 0


@pytest.mark.slow
def test_latent_step_mixed_precision_close():
    """compute_dtype='bfloat16' (the --bf16 flag): same step API, finite
    loss close to the f32 path (network in bf16, diffusion math f32)."""
    import optax

    from codlad_tpu.gen.diffusion import create_diffusion
    from codlad_tpu.models.denoiser import mpnn_diffusion
    from codlad_tpu.train.state import create_train_state
    from codlad_tpu.train.steps import make_latent_step

    B, L = 4, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    res_type = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
    cg = jnp.asarray(np.cumsum(rng.normal(size=(B, L, 3)), 1).astype(np.float32))
    mask = jnp.ones((B, L), bool)
    extras = {"res_type": res_type, "cg_xyz": cg, "mask": mask}

    model = mpnn_diffusion(input_size=3, learn_sigma=True, dropout=0.0,
                           k_neighbors=4)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32),
                        res_type, cg, mask)
    diffusion = create_diffusion(None, diffusion_steps=100, learn_sigma=True)
    tx = optax.adam(1e-3)

    losses = {}
    for tag, cdt in [("f32", None), ("bf16", "bfloat16")]:
        state = create_train_state(jax.tree.map(jnp.copy, params), tx,
                                   with_ema=True)
        step, _ = make_latent_step(model, diffusion, process_kind="diffusion",
                                   compute_dtype=cdt, dropout=False)
        state, m = step(state, x, extras, jax.random.PRNGKey(7))
        losses[tag] = float(m["loss"])
        assert np.isfinite(losses[tag])
    assert abs(losses["bf16"] - losses["f32"]) / abs(losses["f32"]) < 0.05, losses


def test_apply_class_dropout():
    """cfg training: whole-sequence null-token replacement at rate p."""
    import jax
    import jax.numpy as jnp

    from codlad_tpu.train.steps import apply_class_dropout

    rng = jax.random.PRNGKey(0)
    res = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (64, 1))
    assert (np.asarray(apply_class_dropout(rng, res, 0.0, 29)) ==
            np.asarray(res)).all()
    allnull = np.asarray(apply_class_dropout(rng, res, 1.0, 29))
    assert (allnull == 29).all()
    half = np.asarray(apply_class_dropout(rng, res, 0.5, 29))
    row_is_null = (half == 29).all(axis=1)
    row_is_orig = (half == np.asarray(res)).all(axis=1)
    # every row is entirely null or entirely original, and both occur
    assert (row_is_null | row_is_orig).all()
    assert row_is_null.any() and row_is_orig.any()


@pytest.mark.slow
def test_latent_step_with_class_dropout_trains():
    """Train step with --class_dropout_prob: finite loss + nonzero grads
    through the null-token path (prob 1.0 -> all sequences null)."""
    import jax
    import jax.numpy as jnp
    import optax

    from codlad_tpu.gen.diffusion import create_diffusion
    from codlad_tpu.models.denoiser import mpnn_diffusion
    from codlad_tpu.train.state import create_train_state
    from codlad_tpu.train.steps import make_latent_step

    B, L = 4, 12
    rng = np.random.default_rng(0)
    model = mpnn_diffusion(input_size=3, learn_sigma=True, k_neighbors=8,
                           dropout=0.0)
    x1 = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    extras = {
        "res_type": jnp.asarray(rng.integers(0, 20, (B, L)).astype(np.int32)),
        "cg_xyz": jnp.asarray(np.cumsum(
            3.8 * rng.normal(size=(B, L, 3)), axis=1).astype(np.float32)),
        "mask": jnp.ones((B, L), bool),
    }
    params = model.init(jax.random.PRNGKey(0), x1, jnp.zeros((B,), jnp.int32),
                        extras["res_type"], extras["cg_xyz"], extras["mask"])
    state = create_train_state(params, optax.adam(1e-3), with_ema=True)
    # NB diffusion_steps must keep beta_end*scale < 1 (the reference's
    # linear schedule scaling, gaussian_diffusion.py) — tiny step counts
    # make the schedule itself NaN
    process = create_diffusion(None, diffusion_steps=100, learn_sigma=True)
    train_step, _ = make_latent_step(model, process, process_kind="diffusion",
                                     dropout=False, class_dropout_prob=1.0)
    state2, metrics = train_step(state, x1, extras, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_feature_dataset_fresh_reparametrization(tmp_path):
    """fgvae/cgvae features: mu/sigma saved at extract time are re-drawn
    x1 = mu + sigma*eps FRESH each epoch (VERDICT r2 item 5; reference
    utils/dataset_module.py:419-454 re-draws on every access — round 2
    froze one draw into the feature files)."""
    from codlad_tpu.cli.train_latent import FeatureDataset

    rng = np.random.default_rng(0)
    n, L = 6, 8
    steps = rng.normal(size=(n, L + 2, 3))
    np.savez(tmp_path / "prot_0000.npz",
             mu=rng.normal(size=(n, L, 3)).astype(np.float32),
             sigma=np.abs(rng.normal(size=(n, L, 3))).astype(np.float32),
             latents=rng.normal(size=(n, L, 3)).astype(np.float32),
             res_type=rng.integers(0, 20, (n, L)).astype(np.int32),
             cg_xyz_og=np.cumsum(3.8 * steps, axis=1).astype(np.float32),
             res_mask=np.ones((n, L), bool))

    ds = FeatureDataset(str(tmp_path), batch_size=n, shuffle=False)
    epoch1 = next(iter(ds))["x1"]
    epoch2 = next(iter(ds))["x1"]
    assert not np.allclose(epoch1, epoch2), "posterior draw frozen"
    # and the draws center on mu (sanity that it IS mu + sigma*eps)
    z = np.load(tmp_path / "prot_0000.npz")
    for ep in (epoch1, epoch2):
        zscore = (ep - z["mu"]) / z["sigma"]
        assert np.abs(zscore).max() < 6.0


@pytest.mark.slow
def test_adaln_gates_receive_gradient():
    """Regression: with flax's default zero biases the trunk-gated
    adaLN-zero denoiser is in an EXACT gradient deadlock (every gate
    gradient is <downstream, modulation> with both factors zero), and
    Stage-2 training converges to the constant predictor.  The torch-
    parity init (nonzero uniform biases — what torch nn.Linear does by
    default and the reference's xavier loop does not override,
    latent_model.py:151-153) must break it: after a few steps every
    encoder/decoder adaLN modulation kernel is nonzero."""
    import flax
    import jax
    import jax.numpy as jnp
    import optax

    from codlad_tpu.gen.diffusion import create_diffusion
    from codlad_tpu.models.denoiser import mpnn_diffusion
    from codlad_tpu.train.state import create_train_state
    from codlad_tpu.train.steps import make_latent_step

    B, L = 4, 12
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    steps = rng.normal(size=(B, L, 3))
    steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
    extras = {
        "res_type": jnp.asarray(rng.integers(0, 20, (B, L)).astype(np.int32)),
        "cg_xyz": jnp.asarray(np.cumsum(3.8 * steps, axis=1).astype(np.float32)),
        "mask": jnp.ones((B, L), bool),
    }
    model = mpnn_diffusion(input_size=3, learn_sigma=True, dropout=0.0,
                           k_neighbors=8)
    params = model.init(jax.random.PRNGKey(0), x1, jnp.zeros((B,), jnp.int32),
                        extras["res_type"], extras["cg_xyz"], extras["mask"])
    state = create_train_state(params, optax.adamw(1e-3), with_ema=True)
    process = create_diffusion(None, diffusion_steps=1000, learn_sigma=True)
    train_step, _ = make_latent_step(model, process, process_kind="diffusion",
                                     dropout=False)
    key = jax.random.PRNGKey(1)
    for i in range(8):
        state, _ = train_step(state, x1, extras, jax.random.fold_in(key, i))
    flat = flax.traverse_util.flatten_dict(state.params["params"])
    for probe in ("enc_layers_0", "enc_layers_2", "dec_layers_0",
                  "dec_layers_2"):
        ks = [k for k in flat
              if probe in "/".join(k) and "Dense_0" in "/".join(k)
              and k[-1] == "kernel"]
        assert ks, probe
        mx = max(float(np.abs(flat[k]).max()) for k in ks)
        assert mx > 0, f"{probe} adaLN modulation never received gradient"


@pytest.mark.slow
def test_latent_step_grad_accum(tiny_batch):
    """optax.MultiSteps accumulation: params move only on every N-th
    micro-step; the accumulated update approximates the full-batch one."""
    model = mpnn_diffusion(input_size=3, learn_sigma=True, k_neighbors=8,
                           dropout=0.0)
    diffusion = create_diffusion(None, diffusion_steps=100, learn_sigma=True)

    Bsz, L = tiny_batch["res_type"].shape
    extras = {
        "res_type": tiny_batch["res_type"],
        "cg_xyz": tiny_batch["cg_xyz_og"][:, 1:-1],
        "mask": tiny_batch["res_mask"],
    }
    x1 = jax.random.normal(jax.random.PRNGKey(0), (Bsz, L, 3))
    params = model.init(jax.random.PRNGKey(1), x1,
                        jnp.zeros((Bsz,), jnp.int32),
                        extras["res_type"], extras["cg_xyz"],
                        extras["mask"])
    tx = optax.MultiSteps(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4)),
        every_k_schedule=2)
    state = create_train_state(params, tx, with_ema=True)
    train_step, _ = make_latent_step(model, diffusion,
                                     process_kind="diffusion",
                                     dropout=False)

    p0 = jax.tree.map(np.asarray, state.params)
    state, m1 = train_step(state, x1, extras, jax.random.PRNGKey(3))
    p1 = jax.tree.map(np.asarray, state.params)
    # micro-step 1 of 2: accumulate only, params frozen
    same = jax.tree.map(lambda a, b: np.array_equal(a, b), p0, p1)
    assert all(jax.tree.leaves(same))
    state, m2 = train_step(state, x1, extras, jax.random.PRNGKey(4))
    p2 = jax.tree.map(np.asarray, state.params)
    # micro-step 2: the optimizer applies the accumulated gradient
    moved = jax.tree.map(lambda a, b: not np.array_equal(a, b), p1, p2)
    assert any(jax.tree.leaves(moved))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_vqvae_fault_injection_skips_poisoned_batch(tiny_batch):
    """Fault injection (SURVEY 5.3): a batch that produces a non-finite
    loss must be skipped as a zero-gradient step — params AND VQ state
    unchanged, metrics['skipped']=1 — and training continues normally on
    the next clean batch."""
    vae = VAE(embed_dim=36, vqdim=3, mode="vqvae", dec_nconv=2, enc_nconv=2)
    rng = jax.random.PRNGKey(0)
    params = vae.init(rng, tiny_batch)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    state = create_train_state(params, tx, vq_state=vq_init(rng, 64, 3))
    train_step, _ = make_vqvae_step(vae)
    w = weights_to_array(LossWeights(eta=1.0, zeta=0.0))

    # warm one clean step so optimizer state is nontrivial
    state, m0 = train_step(state, tiny_batch, jax.random.PRNGKey(1), w)
    assert float(m0["skipped"]) == 0.0

    poisoned = dict(tiny_batch)
    poisoned["xyz14"] = tiny_batch["xyz14"].at[0, 0, 0, 0].set(jnp.nan)
    p_before = jax.tree.map(np.asarray, state.params)
    cb_before = np.asarray(state.vq_state.codebook)
    state, m1 = train_step(state, poisoned, jax.random.PRNGKey(2), w)
    assert float(m1["skipped"]) == 1.0
    same = jax.tree.map(lambda a, b: np.array_equal(a, np.asarray(b)),
                        p_before, state.params)
    assert all(jax.tree.leaves(same)), "params moved on a poisoned batch"
    np.testing.assert_array_equal(cb_before, np.asarray(state.vq_state.codebook))

    # clean batch afterwards trains (finite loss, params move)
    state, m2 = train_step(state, tiny_batch, jax.random.PRNGKey(3), w)
    assert float(m2["skipped"]) == 0.0 and np.isfinite(float(m2["loss"]))
    moved = jax.tree.map(lambda a, b: not np.array_equal(a, np.asarray(b)),
                         p_before, state.params)
    assert any(jax.tree.leaves(moved))


@pytest.mark.slow
def test_latent_step_with_batch_partitioned_kernels(tiny_batch):
    """Integration: the FULL Stage-2 train step on the 8-device mesh with
    set_kernel_mesh active and the real Pallas kernels running interpreted
    — the configuration a multi-chip TPU trainer runs in (dropout off:
    plain interpret mode cannot lower the hardware PRNG)."""
    import functools

    from jax.experimental import pallas as pl

    from codlad_tpu.kernels import meshing
    from codlad_tpu.kernels import mpnn_kernels as MK

    model = mpnn_diffusion(input_size=3, learn_sigma=True, k_neighbors=8,
                           dropout=0.0)
    diffusion = create_diffusion(None, diffusion_steps=100, learn_sigma=True)
    Bsz, L = tiny_batch["res_type"].shape
    extras = {
        "res_type": tiny_batch["res_type"],
        "cg_xyz": tiny_batch["cg_xyz_og"][:, 1:-1],
        "mask": tiny_batch["res_mask"],
    }
    x1 = jax.random.normal(jax.random.PRNGKey(0), (Bsz, L, 3))
    params = model.init(jax.random.PRNGKey(1), x1,
                        jnp.zeros((Bsz,), jnp.int32),
                        extras["res_type"], extras["cg_xyz"],
                        extras["mask"])
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
    # one jitted step PER configuration: the jit cache keys on shapes/
    # shardings only, so a single step traced before the pallas patch
    # would silently rerun the reference compilation
    train_step, _ = make_latent_step(model, diffusion,
                                     process_kind="diffusion",
                                     dropout=False)

    mesh = mesh_mod.make_mesh(8)
    hb = {k: np.asarray(v) for k, v in dict(extras, x1=np.asarray(x1)).items()}
    hb = mesh_mod.pad_batch_to_devices(hb, 8)
    # host copy: the jitted step DONATES its state, and device_put may
    # alias the source buffers into the replicated tree (same pitfall
    # __graft_entry__ documents) — each config rebuilds from host params
    params = jax.tree.map(np.asarray, params)

    # reference run (pure-JAX kernels, same sharded data)
    sharded = mesh_mod.shard_batch(dict(hb), mesh)
    state = mesh_mod.replicate(
        create_train_state(params, tx, with_ema=True), mesh)
    x1_s = sharded.pop("x1")
    state_ref, m_ref = train_step(state, x1_s, sharded, jax.random.PRNGKey(3))
    loss_ref = float(m_ref["loss"])

    # pallas-interpreted run under the kernel mesh
    orig_call, orig_use, orig_use_b = (pl.pallas_call, MK._use_pallas,
                                       MK._use_pallas_bwd)
    MK.pl.pallas_call = functools.partial(orig_call, interpret=True)
    MK._use_pallas = lambda: True
    MK._use_pallas_bwd = lambda: True
    meshing.set_kernel_mesh(mesh)
    try:
        train_step_p, _ = make_latent_step(model, diffusion,
                                           process_kind="diffusion",
                                           dropout=False)
        sharded = mesh_mod.shard_batch(dict(hb), mesh)
        state = mesh_mod.replicate(
            create_train_state(params, tx, with_ema=True), mesh)
        x1_s = sharded.pop("x1")
        state_p, m_p = train_step_p(state, x1_s, sharded,
                                    jax.random.PRNGKey(3))
        loss_p = float(m_p["loss"])
    finally:
        MK.pl.pallas_call = orig_call
        MK._use_pallas, MK._use_pallas_bwd = orig_use, orig_use_b
        meshing.set_kernel_mesh(None)

    assert np.isfinite(loss_p)
    assert abs(loss_p - loss_ref) < 5e-3, (loss_p, loss_ref)
    # the applied updates agree between the Pallas and pure-JAX backwards
    gp = float(m_p["grad_norm"])
    gr = float(m_ref["grad_norm"])
    assert abs(gp - gr) / max(gr, 1e-9) < 0.02, (gp, gr)


@pytest.mark.slow
def test_vqvae_dp_matches_single_device():
    """VQ-EMA under data parallelism (SURVEY hard part 4; the reference's
    Stage 1 is single-GPU, train_vqvae.py:42): one Stage-1 train step with
    EMA codebook update on the 8-device DP mesh must produce the SAME loss,
    codebook, EMA stats, and params as the single-device run — GSPMD's
    global-reduction semantics make the sharded hard-assignment histogram
    and embed sums exact psums, not per-shard approximations."""
    exs = synthetic_examples(8, 14, seed=3)
    spec = B.spec_for(exs, length_multiple=4, edge_multiple=64)
    hb = B.collate(exs, spec)

    vae = VAE(embed_dim=36, vqdim=3, mode="vqvae", dec_nconv=2, enc_nconv=2)
    rng = jax.random.PRNGKey(0)
    batch1 = {k: jnp.asarray(v) for k, v in hb.items()}
    params = vae.init(rng, batch1)
    params_host = jax.tree.map(np.asarray, params)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    w = weights_to_array(LossWeights(eta=1.0, zeta=0.0))
    vq0 = vq_init(rng, 64, 3)
    vq0_host = jax.tree.map(np.asarray, vq0)

    def run(sharded):
        p = jax.tree.map(jnp.asarray, params_host)
        v = jax.tree.map(jnp.asarray, vq0_host)
        state = create_train_state(p, tx, vq_state=v)
        train_step, _ = make_vqvae_step(vae)
        if sharded:
            mesh = mesh_mod.make_mesh(8)
            state = mesh_mod.replicate(state, mesh)
            batch = mesh_mod.shard_batch(dict(hb), mesh)
        else:
            batch = {k: jnp.asarray(v) for k, v in hb.items()}
        ms = []
        for i in range(3):
            state, m = train_step(state, batch, jax.random.PRNGKey(i), w)
            ms.append(float(m["loss"]))
        return state, ms

    s1, l1 = run(sharded=False)
    s8, l8 = run(sharded=True)
    np.testing.assert_allclose(l8, l1, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(s8.vq_state.codebook),
                               np.asarray(s1.vq_state.codebook), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s8.vq_state.cluster_size),
                               np.asarray(s1.vq_state.cluster_size), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s8.vq_state.embed_avg),
                               np.asarray(s1.vq_state.embed_avg), atol=2e-5)
    flat1 = jax.tree.leaves(jax.tree.map(np.asarray, s1.params))
    flat8 = jax.tree.leaves(jax.tree.map(np.asarray, s8.params))
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, atol=5e-5)


def test_checkpoint_crash_safe_save_and_resume_fallback(tmp_path):
    """A kill at ANY point of a save must leave a restorable checkpoint:
    save() stages to `<name>.new` and swaps only after finalization, and
    exists()/restore() recover the `.new`/`.old` side of an interrupted
    swap. best_resume_name prefers last > newest snapshot > best so a
    destroyed `last` degrades a -resume by one save interval instead of
    silently restarting from scratch (which once cost a live run 4 epochs)."""
    import os
    import shutil

    from codlad_tpu.train.checkpoints import CheckpointManager

    def mk_state(x):
        return create_train_state({"w": jnp.full((3,), float(x))},
                                  optax.adam(1e-3))

    ckpt = CheckpointManager(tmp_path)
    ckpt.save(mk_state(1.0), "last")
    ckpt.save(mk_state(2.0), "last")  # overwrite goes through the swap dance
    assert not os.path.isdir(tmp_path / "last.new")
    assert not os.path.isdir(tmp_path / "last.old")
    got = ckpt.restore(mk_state(0.0), "last")
    np.testing.assert_allclose(np.asarray(got.params["w"]), 2.0)

    # crash between finalizing `.new` and the swap: only `.new` has data
    shutil.move(tmp_path / "last", tmp_path / "last.new")
    assert ckpt.exists("last")
    got = ckpt.restore(mk_state(0.0), "last")
    np.testing.assert_allclose(np.asarray(got.params["w"]), 2.0)

    # crash mid-swap: `last` moved aside to `.old`, `.new` never moved in
    shutil.move(tmp_path / "last.new", tmp_path / "last.old")
    assert ckpt.exists("last")
    got = ckpt.restore(mk_state(0.0), "last")
    np.testing.assert_allclose(np.asarray(got.params["w"]), 2.0)

    # a later save cleans up the leftovers and lands normally
    ckpt.save(mk_state(3.0), "last")
    assert not os.path.isdir(tmp_path / "last.old")
    got = ckpt.restore(mk_state(0.0), "last")
    np.testing.assert_allclose(np.asarray(got.params["w"]), 3.0)

    # resume preference: last > newest epoch_N > best
    ckpt.save(mk_state(4.0), "epoch_5")
    ckpt.save(mk_state(5.0), "epoch_10")
    ckpt.save(mk_state(6.0), "best")
    assert ckpt.best_resume_name("epoch") == "last"
    shutil.rmtree(tmp_path / "last")
    assert ckpt.best_resume_name("epoch") == "epoch_10"
    shutil.rmtree(tmp_path / "epoch_10")
    shutil.rmtree(tmp_path / "epoch_5")
    assert ckpt.best_resume_name("epoch") == "best"
    shutil.rmtree(tmp_path / "best")
    assert ckpt.best_resume_name("epoch") is None


def test_selection_state_replay_matches_uninterrupted_run():
    """Watermark restarts must preserve best-model / plateau / early-stop
    state (VERDICT r4 weak #3): replaying the on-disk val history must
    leave the selection machinery exactly where an uninterrupted run
    would be — in particular the first post-restart epoch must NOT be
    crowned best when an earlier epoch was better."""
    from codlad_tpu.train.logging_utils import (
        EarlyStopping, PlateauLR, lowess_smooth, replay_selection)

    # a stalled-run shape like the round-4 study: improve to a floor at
    # epoch 5, then stall
    vals = [3.0, 2.4, 1.9, 1.5, 1.25, 1.14, 1.24, 1.46, 1.32, 1.38, 1.40]

    # uninterrupted run: the live-loop logic applied epoch by epoch
    hist, best, stopper_u, plateau_u = [], np.inf, EarlyStopping(6), \
        PlateauLR(1e-3, factor=0.3)
    best_epoch_u = -1
    for i, v in enumerate(vals):
        hist.append(v)
        s = lowess_smooth(hist)[-1]
        plateau_u.step(s)
        if s < best:
            best, best_epoch_u = s, i
        stopper_u(s)

    # interrupted at every possible epoch boundary: replay prefix, then
    # continue live — the end state must be identical
    for cut in range(1, len(vals)):
        stopper_r, plateau_r = EarlyStopping(6), PlateauLR(1e-3, factor=0.3)
        hist_r, best_r, bi = replay_selection(vals[:cut], plateau=plateau_r,
                                              stopper=stopper_r)
        for i in range(cut, len(vals)):
            hist_r.append(vals[i])
            s = lowess_smooth(hist_r)[-1]
            plateau_r.step(s)
            if s < best_r:
                best_r, bi = s, i
            stopper_r(s)
        assert best_r == pytest.approx(best)
        assert bi == best_epoch_u
        assert stopper_r.counter == stopper_u.counter
        assert plateau_r.lr == pytest.approx(plateau_u.lr)
        assert plateau_r.bad == plateau_u.bad

    # the bug scenario directly: restart right after the best epoch —
    # the next (worse) epoch must not become best
    stopper_r, plateau_r = EarlyStopping(6), PlateauLR(1e-3)
    _, best_r, _ = replay_selection(vals[:6], plateau=plateau_r,
                                    stopper=stopper_r)
    hist_r = list(vals[:6])
    hist_r.append(vals[6])
    s6 = lowess_smooth(hist_r)[-1]
    assert s6 >= best_r  # epoch 6 (1.24) does not beat the replayed best


def test_train_log_dedupe(tmp_path):
    """read_epoch_rows drops duplicate epoch rows (restart re-appends),
    keeping the LAST occurrence; rewrite round-trips."""
    from codlad_tpu.train.logging_utils import (
        read_epoch_rows, rewrite_epoch_rows)

    p = str(tmp_path / "train_log.csv")
    with open(p, "w") as f:
        f.write("epoch,val_loss\n0,3.0\n1,2.0\n0,3.1\n1,2.1\n2,1.5\n")
    rows = read_epoch_rows(p)
    assert [int(r["epoch"]) for r in rows] == [0, 1, 2]
    assert [float(r["val_loss"]) for r in rows] == [3.1, 2.1, 1.5]
    rewrite_epoch_rows(p, rows, ["epoch", "val_loss"])
    assert read_epoch_rows(p) == rows


@pytest.mark.slow
def test_vqvae_restart_preserves_selection_state(tmp_path):
    """Simulated exit-75 restart through the real CLI: train 1 epoch, get
    watermark-killed, resume for 3 more — the resumed run must replay the
    logged history (log line present), dedupe the CSV, and leave `best`
    tracking the global-min smoothed val, not the first post-restart
    epoch."""
    import json
    import os

    from codlad_tpu.cli import preprocess, train_vqvae
    from codlad_tpu.train.logging_utils import read_epoch_rows

    shards = str(tmp_path / "shards")
    preprocess.main(["--synthetic", "2", "12", "4", "--out_dir", shards])
    logdir = str(tmp_path / "vq")
    common = ["-data_dir", shards, "-logdir", logdir, "-batch_size", "2",
              "-enc_nconv", "2", "-dec_nconv", "2", "-vqdim", "3",
              "-codebook_size", "16", "--no-dp"]

    # first leg: the watermark trips after epoch 0 (any RSS > 1e-4 GB)
    with pytest.raises(SystemExit) as e:
        train_vqvae.main(common + ["-nepochs", "4", "-max_host_gb", "1e-4"])
    assert e.value.code == 75

    # second leg: resume, watermark off
    train_vqvae.main(common + ["-nepochs", "3", "-resume",
                               "-max_host_gb", "0"])

    rows = read_epoch_rows(os.path.join(logdir, "train_log.csv"))
    epochs = [int(r["epoch"]) for r in rows]
    assert epochs == [0, 1, 2]  # deduped, contiguous
    log_txt = open(os.path.join(logdir, "log.txt")).read()
    assert "selection state replayed from 1 logged epochs" in log_txt
    assert os.path.isdir(os.path.join(logdir, "best"))
    # codebook-health telemetry reaches metrics.jsonl (VERDICT r4 item 7)
    mlines = [json.loads(l) for l in
              open(os.path.join(logdir, "metrics.jsonl"))]
    val_rows = [m for m in mlines if m.get("split") == "val"]
    assert val_rows and "vq_perplexity" in val_rows[-1]
    assert 1.0 <= val_rows[-1]["vq_perplexity"] <= 16.0
    assert 0.0 < val_rows[-1]["vq_usage"] <= 1.0
