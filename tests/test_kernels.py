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
