"""Model tests: shapes, jit-ability, masking and invariance properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codlad_tpu.data import batch as B
from codlad_tpu.data.synthetic import synthetic_examples
from codlad_tpu.models.decoder import ICDecoder
from codlad_tpu.models.denoiser import MPNNDenoiser, mpnn_diffusion
from codlad_tpu.models.encoder import E3Encoder
from codlad_tpu.models.prior import CGPrior
from codlad_tpu.models.vae import VAE
from codlad_tpu.models.vq import fsq_quantize, nearest_code, vq_init, vq_quantize


@pytest.fixture(scope="module")
def small_batch():
    exs = synthetic_examples(2, 18, seed=0)
    spec = B.spec_for(exs, length_multiple=8, edge_multiple=128)
    batch = B.collate(exs, spec)
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.slow
def test_encoder_shapes_and_translation_invariance(small_batch):
    enc = E3Encoder(n_atom_basis=36)
    params = enc.init(jax.random.PRNGKey(0), small_batch)
    h = enc.apply(params, small_batch)
    Bsz, L = small_batch["res_type"].shape
    assert h.shape == (Bsz, L, 36)
    assert np.isfinite(np.asarray(h)).all()
    # translating the whole structure must not change the output
    shifted = dict(small_batch)
    shifted["xyz14"] = small_batch["xyz14"] + 5.0
    shifted["cg_xyz_og"] = small_batch["cg_xyz_og"] + 5.0
    h2 = enc.apply(params, shifted)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h2), atol=3e-4)


@pytest.mark.slow
def test_encoder_padding_independence(small_batch):
    """Garbage in padded residues must not leak into valid outputs."""
    enc = E3Encoder(n_atom_basis=36)
    params = enc.init(jax.random.PRNGKey(0), small_batch)
    h = enc.apply(params, small_batch)
    poisoned = dict(small_batch)
    res_mask = np.asarray(small_batch["res_mask"])
    rng = np.random.default_rng(0)
    xyz = np.asarray(small_batch["xyz14"]).copy()
    xyz[~res_mask] = rng.normal(size=xyz[~res_mask].shape) * 100
    poisoned["xyz14"] = jnp.asarray(xyz)
    h2 = enc.apply(params, poisoned)
    np.testing.assert_allclose(
        np.asarray(h)[res_mask], np.asarray(h2)[res_mask], atol=1e-4)


def test_decoder_shapes(small_batch):
    dec = ICDecoder(n_atom_basis=36)
    Bsz, L = small_batch["res_type"].shape
    latents = jnp.zeros((Bsz, L, 36))
    params = dec.init(jax.random.PRNGKey(0), small_batch, latents)
    ic = dec.apply(params, small_batch, latents)
    assert ic.shape == (Bsz, L, 13, 3)
    assert np.isfinite(np.asarray(ic)).all()


def test_prior_shapes(small_batch):
    prior = CGPrior(n_atom_basis=36)
    params = prior.init(jax.random.PRNGKey(0), small_batch)
    mu, sigma = prior.apply(params, small_batch)
    assert mu.shape == sigma.shape == small_batch["res_type"].shape + (36,)
    assert (np.asarray(sigma) >= 0).all()


def test_vae_end_to_end_jit(small_batch):
    vae = VAE(embed_dim=36, vqdim=3, mode="vqvae")
    params = vae.init(jax.random.PRNGKey(0), small_batch)

    @jax.jit
    def run(p, b):
        h = vae.apply(p, b, method=VAE.encode)[0]
        return h, vae.apply(p, b, h, method=VAE.decode)

    h, ic = run(params, small_batch)
    Bsz, L = small_batch["res_type"].shape
    assert h.shape == (Bsz, L, 3)
    assert ic.shape == (Bsz, L, 13, 3)


def test_vq_quantize_roundtrip_and_ema():
    rng = jax.random.PRNGKey(0)
    state = vq_init(rng, 64, 3)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 3))
    mask = jnp.ones((4, 10), dtype=bool)
    zq, idx, loss, new_state = vq_quantize(state, z, mask, train=True)
    assert zq.shape == z.shape
    assert idx.shape == (4, 10)
    assert float(loss) > 0
    # straight-through: gradient of sum(zq) w.r.t. z is ones
    g = jax.grad(lambda zz: vq_quantize(state, zz, mask, train=False)[0].sum())(z)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g), atol=1e-6)
    # EMA moved the assigned codes toward the data
    assert float(jnp.abs(new_state.codebook - state.codebook).sum()) > 0
    # eval mode: quantized values are codebook rows
    zq_eval, idx_eval, _, st = vq_quantize(new_state, z, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(zq_eval), np.asarray(new_state.codebook[idx_eval]), atol=1e-6)


def test_vq_mask_excludes_padding():
    state = vq_init(jax.random.PRNGKey(0), 32, 3)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 3))
    mask = jnp.array([[True] * 6, [True] * 3 + [False] * 3])
    _, _, _, st1 = vq_quantize(state, z, mask, train=True)
    z_poison = z.at[1, 3:].set(1e3)
    _, _, _, st2 = vq_quantize(state, z_poison, mask, train=True)
    np.testing.assert_allclose(np.asarray(st1.codebook), np.asarray(st2.codebook), atol=1e-5)


def test_fsq():
    z = jax.random.normal(jax.random.PRNGKey(0), (8, 5)) * 2
    zq, idx = fsq_quantize(z, [7, 5, 5, 5, 5])
    assert zq.shape == z.shape
    assert (np.asarray(zq) <= 1.0 + 1e-6).all() and (np.asarray(zq) >= -1.0 - 1e-6).all()
    assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 7 * 5**4).all()


@pytest.mark.slow
def test_denoiser_forward_and_jit(small_batch):
    model = mpnn_diffusion(input_size=3, learn_sigma=True, k_neighbors=8, dropout=0.0)
    Bsz, L = small_batch["res_type"].shape
    x = jax.random.normal(jax.random.PRNGKey(0), (Bsz, L, 3))
    t = jnp.array([10, 500])
    mask = small_batch["res_mask"]
    cg = small_batch["cg_xyz_og"][:, 1:-1]
    params = model.init(jax.random.PRNGKey(1), x, t, small_batch["res_type"], cg, mask)

    @jax.jit
    def fwd(p, x, t):
        return model.apply(p, x, t, small_batch["res_type"], cg, mask)

    out = fwd(params, x, t)
    assert out.shape == (Bsz, L, 6)  # mean + learned-range variance
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_denoiser_padding_independence(small_batch):
    model = mpnn_diffusion(input_size=3, learn_sigma=True, k_neighbors=8, dropout=0.0)
    Bsz, L = small_batch["res_type"].shape
    x = jax.random.normal(jax.random.PRNGKey(0), (Bsz, L, 3))
    t = jnp.array([10, 500])
    mask = small_batch["res_mask"]
    cg = small_batch["cg_xyz_og"][:, 1:-1]
    params = model.init(jax.random.PRNGKey(1), x, t, small_batch["res_type"], cg, mask)
    out = model.apply(params, x, t, small_batch["res_type"], cg, mask)
    x2 = jnp.where(mask[..., None], x, 77.0)
    out2 = model.apply(params, x2, t, small_batch["res_type"], cg, mask)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(out2)[m], atol=2e-4)


def test_nearest_code_exact():
    cb = jnp.asarray(np.eye(4, 3, dtype=np.float32))
    z = jnp.asarray(np.array([[0.9, 0.1, 0.0], [0.0, 0.0, 0.9]], dtype=np.float32))
    idx = nearest_code(cb, z)
    assert idx.tolist() == [0, 2]


@pytest.mark.slow
def test_forward_with_cfg(small_batch):
    """CFG forward works (the reference declares but never defines it for
    the MPNN backbone) and halves carry the same guided mean."""
    model = mpnn_diffusion(input_size=3, learn_sigma=True, k_neighbors=8,
                           dropout=0.0)
    Bsz, L = small_batch["res_type"].shape
    mask = small_batch["res_mask"]
    cg = small_batch["cg_xyz_og"][:, 1:-1]
    res = small_batch["res_type"]
    x = jax.random.normal(jax.random.PRNGKey(0), (Bsz, L, 3))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((Bsz,), jnp.int32),
                        res, cg, mask)
    # doubled batch
    x2 = jnp.concatenate([x, x], 0)
    t2 = jnp.zeros((2 * Bsz,), jnp.int32)
    res2 = jnp.concatenate([res, res], 0)
    cg2 = jnp.concatenate([cg, cg], 0)
    mask2 = jnp.concatenate([mask, mask], 0)
    from codlad_tpu.models.denoiser import MPNNDenoiser
    out = model.apply(params, x2, t2, res2, cg2, mask2, 1.5,
                      method=MPNNDenoiser.forward_with_cfg)
    assert out.shape == (2 * Bsz, L, 6)
    np.testing.assert_allclose(np.asarray(out[:Bsz, :, :3]),
                               np.asarray(out[Bsz:, :, :3]), atol=1e-6)


@pytest.mark.slow
def test_self_conditioning_training_losses(small_batch):
    from codlad_tpu.gen.diffusion import create_diffusion

    model = mpnn_diffusion(input_size=3, learn_sigma=True, k_neighbors=8,
                           dropout=0.0, self_condition=True)
    Bsz, L = small_batch["res_type"].shape
    mask = small_batch["res_mask"]
    cg = small_batch["cg_xyz_og"][:, 1:-1]
    res = small_batch["res_type"]
    x = jax.random.normal(jax.random.PRNGKey(0), (Bsz, L, 3))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((Bsz,), jnp.int32),
                        res, cg, mask)
    d = create_diffusion(None, diffusion_steps=100, learn_sigma=True,
                         self_condition=True)

    def model_fn(xt, t, k, x_self_cond=None):
        return model.apply(params, xt, t, res, cg, mask,
                           x_self_cond=x_self_cond, deterministic=True)

    t = jnp.array([3, 50])
    terms = d.training_losses(jax.random.PRNGKey(2), model_fn, x, t,
                              mask=mask[..., None])
    assert np.isfinite(np.asarray(terms["loss"])).all()
    # sampling with self-conditioning runs
    s = d.p_sample_loop_host(jax.random.PRNGKey(3), model_fn, (Bsz, L, 3))
    assert np.isfinite(np.asarray(s)).all()


def test_vq_variants():
    from codlad_tpu.models.vq import (
        expire_dead_codes, vq_init, vq_quantize_cosine, vq_sample_stochastic)

    rng = jax.random.PRNGKey(0)
    state = vq_init(rng, 32, 4)
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 4))
    mask = jnp.ones((3, 8), bool)

    zq, idx, loss, st = vq_quantize_cosine(state, z, mask, train=True)
    assert zq.shape == z.shape and np.isfinite(float(loss))
    norms = np.linalg.norm(np.asarray(st.codebook), axis=-1)
    np.testing.assert_allclose(norms, np.ones(32), atol=1e-5)

    zq2, idx2 = vq_sample_stochastic(jax.random.PRNGKey(2), state, z, 0.5)
    assert zq2.shape == z.shape and idx2.shape == (3, 8)

    st2 = expire_dead_codes(jax.random.PRNGKey(3), state, z)
    # all initial codes are dead (cluster_size 0) -> replaced by batch rows
    flat = np.asarray(z).reshape(-1, 4)
    for row in np.asarray(st2.codebook):
        assert (np.abs(flat - row).sum(-1) < 1e-5).any()


def test_vq_multihead_and_orthogonal():
    from codlad_tpu.models.vq import (
        multihead_vq_quantize, orthogonal_reg_loss, vq_init)

    rng = jax.random.PRNGKey(0)
    states = [vq_init(jax.random.fold_in(rng, h), 16, 2) for h in range(3)]
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 6))
    mask = jnp.ones((2, 5), bool)
    zq, idx, loss, new_states = multihead_vq_quantize(states, z, mask, train=True)
    assert zq.shape == z.shape and idx.shape == (2, 5, 3)
    assert np.isfinite(float(loss))

    # orthogonal loss is zero for an orthonormal codebook
    eye = vq_init(rng, 4, 4).replace(codebook=jnp.eye(4))
    assert float(orthogonal_reg_loss(eye.codebook, weight=10.0)) < 1e-9
    rnd = jax.random.normal(rng, (8, 4))
    assert float(orthogonal_reg_loss(rnd, weight=10.0)) > 0


@pytest.mark.slow
def test_vq_gumbel_variant():
    """Gumbel/cosine VQ (reference 'low3_num16_gumble_cos',
    utils/vq_module.py:152-160): stochastic sampling at train time with
    ReinMax straight-through gradients; deterministic argmax at eval."""
    from codlad_tpu.models.vq import vq_init, vq_quantize_gumbel

    state = vq_init(jax.random.PRNGKey(0), 64, 4)
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 4))
    mask = jnp.ones((3, 8), bool).at[:, -2:].set(False)

    zq, idx, loss, st = vq_quantize_gumbel(
        jax.random.PRNGKey(2), state, z, mask, train=True)
    assert zq.shape == z.shape and idx.shape == (3, 8)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # codebook stays on the unit sphere where updated
    upd = np.asarray(st.cluster_size) > 1e-3
    norms = np.linalg.norm(np.asarray(st.codebook), axis=-1)
    np.testing.assert_allclose(norms[upd], 1.0, atol=1e-5)

    # gradients flow to the ENCODER input through the reinmax one-hot
    g = jax.grad(lambda z: vq_quantize_gumbel(
        jax.random.PRNGKey(2), state, z, mask, train=True)[0].sum())(z)
    assert float(jnp.abs(g).sum()) > 0

    # eval: deterministic cosine argmax, repeated calls agree, no state touch
    zq_e, idx_e, _, st_e = vq_quantize_gumbel(None, state, z, mask, train=False)
    zq_e2, idx_e2, _, _ = vq_quantize_gumbel(None, state, z, mask, train=False)
    np.testing.assert_array_equal(np.asarray(idx_e), np.asarray(idx_e2))
    assert st_e is not None
    norm = lambda v: v / np.maximum(
        np.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    sims = norm(np.asarray(z).reshape(-1, 4)) @ norm(
        np.asarray(state.codebook)).T
    np.testing.assert_array_equal(np.asarray(idx_e).reshape(-1),
                                  sims.argmax(-1))


@pytest.mark.slow
def test_build_quantize_reference_aliases():
    """build_quantize must accept every reference method string
    (utils/vq_module.py:98-163 dispatch)."""
    from codlad_tpu.models.vq import build_quantize

    for name, kind, size in [
            ("vqema", "vqvae", 256), ("vqvae", "vqvae", 256),
            ("vq_3", "vqvae", 256), ("fsq_5", "fsq", 256),
            ("Expiring_stalevq", "expire", 256),
            ("orthogonal_vq", "orthogonal", 256),
            ("headvq", "multihead", 256),
            ("low_cosvq_3", "cosine", 256 * 16),
            ("low3_num16_gumble_cos", "gumbel", 256 * 16)]:
        dim = 5 if kind == "fsq" else (8 if kind == "multihead" else 3)
        q = build_quantize(name, codebook_size=256, dim=dim)
        assert q.kind == kind, (name, q.kind)
        assert q.codebook_size == size, (name, q.codebook_size)
        st = q.init(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, dim))
        zq, idx, loss, _ = q.quantize(st, z, train=True,
                                      rng=jax.random.PRNGKey(2))
        assert zq.shape == z.shape and np.isfinite(float(loss))


def test_protein_features_full_backbone(small_batch):
    from codlad_tpu.nn.mpnn import ProteinFeatures

    Bsz, L = small_batch["res_type"].shape
    # N, CA, C, O from the atom14 slots (1, 3, 2, 0)
    x14 = small_batch["xyz14"]
    X = jnp.stack([x14[:, :, 1], x14[:, :, 3], x14[:, :, 2], x14[:, :, 0]], axis=2)
    mask = small_batch["res_mask"].astype(jnp.float32)
    feat = ProteinFeatures(64, top_k=8)
    ridx = jnp.broadcast_to(jnp.arange(L)[None], (Bsz, L))
    chains = jnp.ones((Bsz, L))
    params = feat.init(jax.random.PRNGKey(0), X, mask, ridx, chains)
    E, E_idx = feat.apply(params, X, mask, ridx, chains)
    assert E.shape == (Bsz, L, 8, 64)
    assert np.isfinite(np.asarray(E)).all()


def test_sparse_dense_edge_ops_agree():
    """The gather/segment fallback must match the one-hot path exactly."""
    from codlad_tpu.nn.graph import DenseEdgeOps, SparseEdgeOps, make_edge_ops

    rng = np.random.default_rng(0)
    B, E, N, F = 2, 40, 12, 8
    edges = jnp.asarray(rng.integers(0, N, size=(B, E, 2)).astype(np.int32))
    mask = jnp.asarray(rng.random((B, E)) > 0.3)
    nodes = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    msgs = jnp.asarray(rng.normal(size=(B, E, F)).astype(np.float32))

    dense = make_edge_ops(edges, mask, N)
    sparse = make_edge_ops(edges, mask, N, dense_limit_bytes=1)
    assert isinstance(dense, DenseEdgeOps) and isinstance(sparse, SparseEdgeOps)

    for fn in ("gather_src", "gather_dst"):
        a = np.asarray(getattr(dense, fn)(nodes))
        b = np.asarray(getattr(sparse, fn)(nodes))
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=fn)
    for red in ("sum", "mean"):
        a = np.asarray(dense.aggregate_to_src(msgs, red))
        b = np.asarray(sparse.aggregate_to_src(msgs, red))
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=red)


@pytest.mark.slow
def test_adaln_gate_modes():
    """'trunk' (reference) zeroes the whole layer output at init
    (protein_mpnn_utils.py:249,270); 'residual' (DiT-style opt-in) is the
    identity at init — the training-efficiency variant of ROADMAP 7."""
    from codlad_tpu.nn.mpnn import EncLayerDiffusion

    rng = np.random.default_rng(0)
    B, L, K, H = 2, 8, 4, 16
    h_V = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    h_E = jnp.asarray(rng.normal(size=(B, L, K, H)).astype(np.float32))
    from codlad_tpu.nn.mpnn import make_neighbor_gather
    nbr = make_neighbor_gather(
        jnp.asarray(rng.integers(0, L, size=(B, L, K)).astype(np.int32)))
    c = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    trunk = EncLayerDiffusion(H, H * 2, dropout=0.0)
    p1 = trunk.init(jax.random.PRNGKey(0), h_V, h_E, nbr, c=c)
    v1, e1 = trunk.apply(p1, h_V, h_E, nbr, c=c)
    np.testing.assert_allclose(np.asarray(v1), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e1), 0.0, atol=1e-6)

    res = EncLayerDiffusion(H, H * 2, dropout=0.0, gate_mode="residual")
    p2 = res.init(jax.random.PRNGKey(0), h_V, h_E, nbr, c=c)
    v2, e2 = res.apply(p2, h_V, h_E, nbr, c=c)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(h_V), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(h_E), atol=1e-6)


@pytest.mark.slow
def test_denoiser_residual_adaln_runs():
    from codlad_tpu.models.denoiser import mpnn_diffusion

    rng = np.random.default_rng(1)
    B, L = 2, 12
    x = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    t = jnp.zeros((B,), jnp.int32)
    res_type = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
    cg = jnp.asarray(np.cumsum(rng.normal(size=(B, L, 3)), 1).astype(np.float32))
    mask = jnp.ones((B, L), bool)
    model = mpnn_diffusion(input_size=3, learn_sigma=True, dropout=0.0,
                           k_neighbors=4, adaln_mode="residual")
    params = model.init(jax.random.PRNGKey(0), x, t, res_type, cg, mask)
    out = model.apply(params, x, t, res_type, cg, mask, deterministic=True)
    assert out.shape == (B, L, 6)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_build_quantize_variants_train_step():
    """quantize_type dispatch (reference build_quantize,
    utils/vq_module.py:98-163): every variant drives a full Stage-1 train
    step; FSQ is stateless; expire replaces dead codes."""
    import optax

    from codlad_tpu.data import batch as B
    from codlad_tpu.data.synthetic import synthetic_examples
    from codlad_tpu.models.vae import VAE
    from codlad_tpu.models.vq import build_quantize
    from codlad_tpu.train.state import create_train_state
    from codlad_tpu.train.steps import make_vqvae_step, weights_to_array
    from codlad_tpu.train.losses import LossWeights

    exs = synthetic_examples(2, 10, seed=0)
    spec = B.spec_for(exs, length_multiple=4, edge_multiple=64)
    batch = {k: jnp.asarray(v) for k, v in B.collate(exs, spec).items()}
    w = weights_to_array(LossWeights())

    for kind, dim in [("cosine", 3), ("orthogonal", 3), ("expire", 3),
                      ("fsq", 5)]:
        vae = VAE(embed_dim=36, vqdim=dim, mode="vqvae", dec_nconv=1,
                  enc_nconv=1)
        params = vae.init(jax.random.PRNGKey(0), batch)
        q = build_quantize(kind, codebook_size=32, dim=dim)
        vq_state = q.init(jax.random.PRNGKey(1))
        cb_before = (None if vq_state is None
                     else np.array(vq_state.codebook))  # step donates state
        state = create_train_state(params, optax.adam(1e-3),
                                   vq_state=vq_state)
        step, _ = make_vqvae_step(vae, quantizer=q)
        state2, metrics = step(state, batch, jax.random.PRNGKey(2), w)
        assert np.isfinite(float(metrics["loss"])), kind
        if kind == "fsq":
            assert state2.vq_state is None
        else:
            assert not np.allclose(np.asarray(state2.vq_state.codebook),
                                   cb_before), kind
    # cosine keeps its codebook on the sphere
    q = build_quantize("cosine", codebook_size=16, dim=3)
    st = q.init(jax.random.PRNGKey(3))
    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 3)).astype(np.float32))
    _, _, _, st2 = q.quantize(st, z, train=True)
    norms = np.linalg.norm(np.asarray(st2.codebook), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


@pytest.mark.slow
def test_encoder_bf16_compute_close_to_f32():
    """bf16 TP feature path (Stage-1 -bf16 flag): finite and within bf16
    tolerance of the f32 path; geometry/readout stay f32."""
    from codlad_tpu.data import batch as B
    from codlad_tpu.data.synthetic import synthetic_examples
    from codlad_tpu.models.vae import VAE

    exs = synthetic_examples(2, 12, seed=0)
    spec = B.spec_for(exs, length_multiple=4, edge_multiple=64)
    batch = {k: jnp.asarray(v) for k, v in B.collate(exs, spec).items()}
    v32 = VAE(embed_dim=36, vqdim=3, enc_nconv=2, dec_nconv=1)
    v16 = VAE(embed_dim=36, vqdim=3, enc_nconv=2, dec_nconv=1,
              compute_dtype="bfloat16")
    params = v32.init(jax.random.PRNGKey(0), batch)
    h32, _ = v32.apply(params, batch, method=VAE.encode)
    h16, _ = v16.apply(params, batch, method=VAE.encode)
    assert h16.dtype == jnp.float32
    assert np.isfinite(np.asarray(h16)).all()
    scale = np.abs(np.asarray(h32)).mean() + 1e-6
    err = np.abs(np.asarray(h16) - np.asarray(h32)).mean() / scale
    assert err < 0.1, err


@pytest.mark.slow
def test_denoiser_remat_equivalence():
    """remat=True (jax.checkpoint'd layers): identical params/outputs/
    gradients to the plain model - only the backward's memory schedule
    changes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from codlad_tpu.models.denoiser import mpnn_diffusion

    rng = np.random.default_rng(0)
    B, L = 2, 12
    x = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    t = jnp.asarray([3, 7], jnp.int32)
    res = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
    cg = jnp.asarray(np.cumsum(rng.normal(scale=2.0, size=(B, L, 3)),
                               axis=1).astype(np.float32))
    mask = jnp.ones((B, L), jnp.float32)

    kw = dict(input_size=3, learn_sigma=True, k_neighbors=6, dropout=0.3)
    m0 = mpnn_diffusion(**kw)
    m1 = mpnn_diffusion(remat=True, **kw)
    p0 = m0.init(jax.random.PRNGKey(1), x, t, res, cg, mask)
    p1 = m1.init(jax.random.PRNGKey(1), x, t, res, cg, mask)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: a.shape == b.shape, p0, p1))

    def loss(m):
        def f(p):
            out = m.apply(p, x, t, res, cg, mask)
            return (out * jnp.sin(0.1 * jnp.arange(out.size)
                                  .reshape(out.shape))).sum()
        return f

    np.testing.assert_allclose(np.asarray(loss(m0)(p0)),
                               np.asarray(loss(m1)(p1)), rtol=1e-6)
    g0 = jax.grad(loss(m0))(p0)
    g1 = jax.grad(loss(m1))(p1)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5), g0, g1)

    # dropout path (rngs thread through the remat boundary)
    out_d = m1.apply(p1, x, t, res, cg, mask, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(5)})
    assert np.isfinite(np.asarray(out_d)).all()


@pytest.mark.slow
def test_residual_vq_and_quantizer_dispatch():
    """rvq: quantization error drops with every stage; the Quantizer
    dispatches rvq and multihead with per-stage/head state lists, and
    snap() flattens multi-stage indices."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from codlad_tpu.models.vq import build_quantize, residual_vq_quantize

    rng_np = np.random.default_rng(0)
    z = jnp.asarray(rng_np.normal(size=(4, 32, 4)).astype(np.float32))
    mask = jnp.ones((4, 32), jnp.float32)

    q1 = build_quantize("vqvae", codebook_size=32, dim=4)
    q2 = build_quantize("rvq", codebook_size=32, dim=4, n_stages=3)
    s1, s2 = q1.init(jax.random.PRNGKey(0)), q2.init(jax.random.PRNGKey(0))

    # burn a few EMA updates so codebooks adapt
    for i in range(20):
        _, _, _, s1 = q1.quantize(s1, z, mask, train=True)
        _, _, _, s2 = q2.quantize(s2, z, mask, train=True)

    zq1, idx1, _, _ = q1.quantize(s1, z, mask, train=False)
    zq2, idx2, _, _ = q2.quantize(s2, z, mask, train=False)
    e1 = float(((z - zq1) ** 2).mean())
    e2 = float(((z - zq2) ** 2).mean())
    assert e2 < e1, (e1, e2)  # 3 stages beat 1 at equal codebook size
    assert idx2.shape == z.shape[:-1] + (3,)

    # per-stage residual errors decrease monotonically
    resid = z
    errs = []
    for st in s2:
        zq, _, _, _ = residual_vq_quantize([st], resid, mask, train=False)
        hard = jax.lax.stop_gradient(zq)
        errs.append(float(((resid - hard) ** 2).mean()))
        resid = resid - hard
    assert errs[0] > errs[-1]

    # straight-through: d out / d z == identity (sum-of-out grads == ones)
    g = jax.grad(lambda zz: q2.quantize(s2, zz, mask, train=False)[0].sum())(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)

    # multihead dispatch + snap index flattening
    qh = build_quantize("multihead", codebook_size=32, dim=4, n_heads=2)
    sh = qh.init(jax.random.PRNGKey(1))
    zqh, idxh, _, _ = qh.quantize(sh, z, mask, train=True)
    assert zqh.shape == z.shape and idxh.shape == z.shape[:-1] + (2,)
    _, flat = q2.snap(s2, z)
    assert flat.shape == z.shape[:-1] + (3,)
