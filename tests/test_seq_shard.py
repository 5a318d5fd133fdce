"""Sequence parallelism (parallel/sequence.py + the denoiser's seq mode):
residues sharded over a mesh axis must reproduce the dense model exactly
(same params — checkpoints are interchangeable)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from codlad_tpu.models.denoiser import mpnn_diffusion
from codlad_tpu.parallel.sequence import ring_knn

pytestmark = pytest.mark.slow  # 8-device-mesh sharded train/eval steps

N_SHARDS = 4
B, L, K, H = 2, 32, 8, 32


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:N_SHARDS]), ("seq",))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    steps = rng.normal(size=(B, L, 3))
    steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
    cg = jnp.asarray(np.cumsum(3.8 * steps, axis=1).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    res = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.float32)
    t = jnp.asarray(rng.integers(0, 1000, size=(B,)).astype(np.int32))
    return x, t, res, cg, mask


def _dense_knn(Ca, maskf, k):
    """The dense CAProteinFeatures._dist semantics (nn/mpnn.py)."""
    mask_2d = maskf[:, None, :] * maskf[:, :, None]
    dX = Ca[:, None, :, :] - Ca[:, :, None, :]
    D = mask_2d * jnp.sqrt(jnp.sum(dX**2, axis=-1) + 1e-6)
    D_adjust = D + (1.0 - mask_2d) * jnp.max(D, axis=-1, keepdims=True)
    neg, idx = jax.lax.top_k(-D_adjust, k)
    return -neg, idx


def test_ring_knn_matches_dense(mesh, data):
    _, _, _, cg, mask = data
    d_ref, i_ref = _dense_knn(cg, mask, K)

    fn = shard_map(
        functools.partial(ring_knn, k=K, axis_name="seq",
                          n_shards=N_SHARDS),
        mesh=mesh, in_specs=(P(None, "seq", None), P(None, "seq")),
        out_specs=(P(None, "seq", None), P(None, "seq", None)))
    d_ring, i_ring = jax.jit(fn)(cg, mask)

    np.testing.assert_allclose(np.asarray(d_ring), np.asarray(d_ref),
                               rtol=1e-6, atol=1e-6)
    # same neighbor SETS per row (merge order may permute equal distances;
    # random coordinates make ties measure-zero, so sets match exactly)
    np.testing.assert_array_equal(np.sort(np.asarray(i_ring), axis=-1),
                                  np.sort(np.asarray(i_ref), axis=-1))


def _models():
    kw = dict(input_size=3, hidden_dim=H, edge_features=H, node_features=H,
              num_encoder_layers=2, num_decoder_layers=2, k_neighbors=K,
              dropout=0.0, learn_sigma=True)
    dense = mpnn_diffusion(**kw)
    sharded = mpnn_diffusion(**kw, seq=("seq", N_SHARDS))
    return dense, sharded


def _sharded_apply(mesh, sharded, params, x, t, res, cg, mask):
    def f(params, x, t, res, cg, mask):
        return sharded.apply(params, x, t, res, cg, mask,
                             deterministic=True)

    fn = shard_map(
        f, mesh=mesh,
        in_specs=(P(), P(None, "seq", None), P(), P(None, "seq"),
                  P(None, "seq", None), P(None, "seq")),
        out_specs=P(None, "seq", None))
    return jax.jit(fn)(params, x, t, res, cg, mask)


def test_sharded_forward_matches_dense(mesh, data):
    x, t, res, cg, mask = data
    dense, sharded = _models()
    params = dense.init(jax.random.PRNGKey(0), x, t, res, cg, mask)

    out_dense = dense.apply(params, x, t, res, cg, mask, deterministic=True)
    out_seq = _sharded_apply(mesh, sharded, params, x, t, res, cg, mask)
    np.testing.assert_allclose(np.asarray(out_seq), np.asarray(out_dense),
                               rtol=2e-4, atol=2e-5)


def test_sharded_grads_match_dense(mesh, data):
    x, t, res, cg, mask = data
    dense, sharded = _models()
    params = dense.init(jax.random.PRNGKey(0), x, t, res, cg, mask)

    def loss_dense(p):
        out = dense.apply(p, x, t, res, cg, mask, deterministic=True)
        return jnp.sum(out**2 * mask[..., None])

    def loss_seq(p):
        def f(p, x, t, res, cg, mask):
            out = sharded.apply(p, x, t, res, cg, mask, deterministic=True)
            return jax.lax.psum(jnp.sum(out**2 * mask[..., None]), "seq")

        fn = shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(None, "seq", None), P(), P(None, "seq"),
                      P(None, "seq", None), P(None, "seq")),
            out_specs=P())
        return fn(p, x, t, res, cg, mask)

    l_d, g_d = jax.value_and_grad(loss_dense)(params)
    l_s, g_s = jax.jit(jax.value_and_grad(loss_seq))(params)
    np.testing.assert_allclose(float(l_s), float(l_d), rtol=1e-5)
    flat_d = jax.tree_util.tree_leaves_with_path(g_d)
    flat_s = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_s)}
    for k, v in flat_d:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_s[ks]), np.asarray(v), rtol=5e-4, atol=1e-4,
            err_msg=ks)


def test_sharded_forward_masked_rows(mesh, data):
    """Padded (masked) rows must not perturb valid-row outputs: the ring
    path fills masked neighbor slots with different indices than the dense
    row-max rule, but attention masking kills both."""
    x, t, res, cg, mask = data
    mask = mask.at[:, -5:].set(0.0)
    dense, sharded = _models()
    params = dense.init(jax.random.PRNGKey(0), x, t, res, cg, mask)

    out_dense = dense.apply(params, x, t, res, cg, mask, deterministic=True)
    out_seq = _sharded_apply(mesh, sharded, params, x, t, res, cg, mask)
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(out_seq)[valid],
                               np.asarray(out_dense)[valid],
                               rtol=2e-4, atol=2e-5)


def test_pipeline_seq_sharded_sampling_matches_dense(mesh, data):
    """--seq_shards through SamplingPipeline: with the deterministic DDIM
    sampler (eta=0) the sequence-sharded trajectory must reproduce the
    dense one exactly (same params, same initial noise)."""
    from codlad_tpu.eval.harness import SamplingPipeline
    from codlad_tpu.gen.diffusion import create_diffusion

    x, t, res, cg, mask = data
    dense, _ = _models()
    params = dense.init(jax.random.PRNGKey(0), x, t, res, cg, mask)
    process = create_diffusion("ddim4", diffusion_steps=40, learn_sigma=True)

    def make(n):
        return SamplingPipeline(
            denoiser=dense, denoiser_params=params, process=process,
            process_kind="diffusion", vae=None, vae_params=None,
            vq_state=None, norm_mean=np.zeros(3), norm_std=np.ones(3),
            latent_size=3, sampler="ddim", ddim_eta=0.0, seq_shards=n)

    extras = {"res_type": res, "cg_xyz": cg, "mask": mask}
    rng = jax.random.PRNGKey(5)
    lat_dense = make(0).sample_latents(rng, extras)
    lat_seq = make(N_SHARDS).sample_latents(rng, extras)
    np.testing.assert_allclose(np.asarray(lat_seq), np.asarray(lat_dense),
                               rtol=2e-4, atol=2e-5)

    with pytest.raises(ValueError):
        bad = {"res_type": res[:, :30], "cg_xyz": cg[:, :30],
               "mask": mask[:, :30]}
        make(N_SHARDS).sample_latents(rng, bad)


def test_seq_sharded_train_step_matches_dense(data):
    """make_latent_step(seq_mesh=...): one full Stage-2 train step (loss,
    grads through the shard_map transpose, SGD update) on a 2-D
    data x seq mesh must reproduce the dense step (dropout off; the rng
    threading outside the network is identical so t / q-sample noise
    match)."""
    import optax

    from codlad_tpu.gen.diffusion import create_diffusion
    from codlad_tpu.train.mesh import make_mesh_2d, replicate, shard_batch
    from codlad_tpu.train.state import create_train_state
    from codlad_tpu.train.steps import make_latent_step

    x, t, res, cg, mask = data
    dense, _ = _models()
    params = dense.init(jax.random.PRNGKey(0), x, t, res, cg, mask)
    process = create_diffusion(None, diffusion_steps=100, learn_sigma=True)
    extras = {"res_type": res, "cg_xyz": cg, "mask": mask}

    mesh2 = make_mesh_2d(4, rows=2)          # ('data', 'seq') = 2 x 2
    step_d, eval_d = make_latent_step(dense, process,
                                      process_kind="diffusion",
                                      dropout=False)
    step_s, eval_s = make_latent_step(dense, process,
                                      process_kind="diffusion",
                                      dropout=False, seq_mesh=(mesh2, 2))

    def fresh_state():
        # the step donates its state: each state needs its own buffers
        return create_train_state(jax.tree.map(jnp.copy, params),
                                  optax.sgd(1e-2), with_ema=True)

    rng = jax.random.PRNGKey(7)
    sd, md = step_d(fresh_state(), x, extras, rng)
    sb = shard_batch(dict(extras, x1=x), mesh2)
    x_s = sb.pop("x1")
    ss, ms = step_s(replicate(fresh_state(), mesh2), x_s, sb, rng)

    np.testing.assert_allclose(float(ms["loss"]), float(md["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(ms["grad_norm"]),
                               float(md["grad_norm"]), rtol=5e-4)
    flat_d = jax.tree_util.tree_leaves_with_path(sd.params)
    flat_s = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(ss.params)}
    for k, v in flat_d:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_s[ks]), np.asarray(v), rtol=5e-4, atol=1e-5,
            err_msg=ks)

    # eval step agrees too (validation under seq sharding)
    ed = eval_d(sd, x, extras, rng)
    es = eval_s(ss, x_s, sb, rng)
    np.testing.assert_allclose(float(es["loss"]), float(ed["loss"]),
                               rtol=1e-4)


def test_seq_sharded_cfg_sampling_matches_dense(mesh, data):
    """--seq_shards now composes with classifier-free guidance: with the
    deterministic DDIM sampler, the sharded cfg trajectory must reproduce
    the dense `_sample_from_cond_cfg` exactly."""
    from codlad_tpu.eval.harness import SamplingPipeline
    from codlad_tpu.gen.diffusion import create_diffusion

    x, t, res, cg, mask = data
    dense, _ = _models()
    params = dense.init(jax.random.PRNGKey(0), x, t, res, cg, mask)
    process = create_diffusion("ddim4", diffusion_steps=40, learn_sigma=True)

    def make(n):
        return SamplingPipeline(
            denoiser=dense, denoiser_params=params, process=process,
            process_kind="diffusion", vae=None, vae_params=None,
            vq_state=None, norm_mean=np.zeros(3), norm_std=np.ones(3),
            latent_size=3, sampler="ddim", ddim_eta=0.0, cfg_scale=2.5,
            seq_shards=n)

    extras = {"res_type": res, "cg_xyz": cg, "mask": mask}
    rng = jax.random.PRNGKey(5)
    lat_dense = make(0).sample_latents(rng, extras)
    lat_seq = make(N_SHARDS).sample_latents(rng, extras)
    np.testing.assert_allclose(np.asarray(lat_seq), np.asarray(lat_dense),
                               rtol=2e-4, atol=2e-5)
