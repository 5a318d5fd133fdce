"""Pallas kernel tests (interpret mode on CPU) vs reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from codlad_tpu.kernels import mpnn_kernels as MK


def _inputs(B=2, L=16, K=8, H=128, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32), dtype)
    E = jnp.asarray(rng.normal(size=(B, L, K, H)).astype(np.float32), dtype)
    Gn = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32), dtype)
    idx = jnp.asarray(rng.integers(0, L, size=(B, L, K)).astype(np.int32))
    mask = jnp.asarray((rng.random((B, L, K)) > 0.2).astype(np.float32))
    W_e = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.05, dtype)
    W2 = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.05, dtype)
    b2 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
    W3 = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.05, dtype)
    b3 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
    return A, E, Gn, idx, mask, W_e, W2, b2, W3, b3


def test_reference_message_matches_composed_ops():
    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs()
    out = MK._ref_message_sum(A, E, Gn, idx, mask, W_e, W2, b2, W3, b3, 30.0)
    B, L, K, H = E.shape
    g = jnp.take_along_axis(Gn, idx.reshape(B, L * K, 1), 1).reshape(B, L, K, H)
    pre = A[:, :, None] + E @ W_e + g
    gelu = lambda x: jax.nn.gelu(x, approximate=True)
    m = gelu(gelu(pre) @ W2 + b2) @ W3 + b3
    want = (m * mask[..., None]).sum(2) / 30.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def _run_pallas_interpret(kernel_fn, ref_fn):
    """Run the pallas path in interpreter mode and compare to reference."""
    import functools
    orig = pl.pallas_call
    try:
        MK.pl.pallas_call = functools.partial(orig, interpret=True)
        got = kernel_fn()
    finally:
        MK.pl.pallas_call = orig
    want = ref_fn()
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want, dtype=np.float32),
                               atol=2e-4, rtol=2e-4)


def _onehot(idx, L):
    B = idx.shape[0]
    return jax.nn.one_hot(idx.reshape(B, -1), L, dtype=jnp.float32)


def test_pallas_sum_kernel_interpret():
    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs()
    oh = _onehot(idx, E.shape[1])
    _run_pallas_interpret(
        lambda: MK._pallas_message_sum(A, E, Gn, oh, mask, W_e, W2, b2, W3, b3, 30.0),
        lambda: MK._ref_message_sum(A, E, Gn, idx, mask, W_e, W2, b2, W3, b3, 30.0))


def test_pallas_edge_kernel_interpret():
    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs()
    oh = _onehot(idx, E.shape[1])
    _run_pallas_interpret(
        lambda: MK._pallas_message_edge(A, E, Gn, oh, W_e, W2, b2, W3, b3),
        lambda: MK._ref_message(A, E, Gn, idx, W_e, W2, b2, W3, b3))


def test_fused_message_sum_gradients():
    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs(B=1, L=8, K=4)
    oh = _onehot(idx, E.shape[1])

    def loss_fused(A, E, Gn, W2):
        return MK.fused_message_sum(A, E, Gn, idx, oh, mask, W_e, W2, b2, W3, b3, 30.0).sum()

    def loss_ref(A, E, Gn, W2):
        return MK._ref_message_sum(A, E, Gn, idx, mask, W_e, W2, b2, W3, b3, 30.0).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(A, E, Gn, W2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(A, E, Gn, W2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_edge_lnmod_kernel_interpret_matches_reference():
    """Fused edge-chain + LayerNorm + adaLN epilogue kernel == reference
    twin (interpret mode)."""
    from codlad_tpu.kernels import mpnn_kernels as MK

    rng = np.random.default_rng(0)
    B, L, K, H = 2, 16, 4, 128
    A = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    E = jnp.asarray(rng.normal(size=(B, L, K, H)).astype(np.float32))
    Gn = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, L, (B, L, K)).astype(np.int32))
    onehot = jax.nn.one_hot(idx.reshape(B, L * K), L, dtype=jnp.float32)
    W_e = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.05)
    W2 = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.05)
    W3 = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.05)
    b2 = jnp.zeros(H)
    b3 = jnp.zeros(H)
    sh = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    sc = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    ref = MK._ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                     sh, sc, g, onehot)

    import jax.experimental.pallas as pl_mod
    real_call = pl_mod.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return real_call(*a, **k)

    MK.pl.pallas_call = interp_call
    try:
        out = MK._pallas_message_edge_lnmod(A, E, Gn, onehot, W_e, W2, b2,
                                            W3, b3, sh, sc, g)
    finally:
        MK.pl.pallas_call = real_call
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_enc_layer_fused_epilogue_equivalent():
    """EncLayerDiffusion with the fused h_E epilogue (deterministic path)
    equals the explicit ln+modulate ops (non-deterministic path with
    dropout 0 semantics) through the CPU reference twins."""
    from codlad_tpu.nn.mpnn import EncLayerDiffusion, make_neighbor_gather

    rng = np.random.default_rng(1)
    B, L, K, H = 2, 8, 4, 16
    h_V = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    h_E = jnp.asarray(rng.normal(size=(B, L, K, H)).astype(np.float32))
    nbr = make_neighbor_gather(
        jnp.asarray(rng.integers(0, L, (B, L, K)).astype(np.int32)))
    c = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    layer = EncLayerDiffusion(H, H * 2, dropout=0.3)
    params = layer.init(jax.random.PRNGKey(0), h_V, h_E, nbr, c=c)
    # perturb so adaLN gates are nonzero
    params = jax.tree.map(
        lambda p: p + 0.1 * np.float32(1.0), params)
    v1, e1 = layer.apply(params, h_V, h_E, nbr, c=c, deterministic=True)
    # explicit branch: dropout>0 but rngs deterministic=False needs rng;
    # compare against dropout=0.0 layer (same params shapes)
    layer0 = EncLayerDiffusion(H, H * 2, dropout=0.0)
    v2, e2 = layer0.apply(params, h_V, h_E, nbr, c=c,
                          deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)
