"""Pallas edge gather/aggregate kernels (kernels/edge_kernels.py):
interpret-mode equality with the pure-JAX twins, incl. gradients and the
mutual-transpose VJP identity."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from codlad_tpu.kernels import edge_kernels as EK

pytestmark = pytest.mark.slow  # Pallas interpret-mode edge-kernel sweeps


def _data(seed=0, B=2, E=1100, N=40, F=7):
    rng = np.random.default_rng(seed)
    idx = jnp.asarray(rng.integers(0, N, (B, E)).astype(np.int32))
    maskf = jnp.asarray((rng.random((B, E)) > 0.25).astype(np.float32))
    nodes = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    msgs = jnp.asarray(rng.normal(size=(B, E, F)).astype(np.float32))
    return idx, maskf, nodes, msgs


def test_gather_kernel_matches_reference():
    idx, maskf, nodes, _ = _data()
    ref = EK._ref_gather(idx, maskf, nodes)
    out = EK._pallas_gather(idx, maskf, nodes, interpret=True)
    # hi/lo bf16 split: ~16 mantissa bits => ~1e-5 relative
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=2e-5)


def test_aggregate_kernel_matches_reference():
    idx, maskf, _, msgs = _data()
    N = 40
    ref = EK._ref_aggregate(idx, maskf, msgs, N)
    out = EK._pallas_aggregate(idx, maskf, msgs, N, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=2e-5)


def test_edge_padding_tile_boundary():
    # E exactly at and just past the tile size
    for E in (EK._TILE_E, EK._TILE_E + 1, 2 * EK._TILE_E - 1):
        idx, maskf, nodes, msgs = _data(seed=E, E=E)
        np.testing.assert_allclose(
            np.asarray(EK._pallas_gather(idx, maskf, nodes, interpret=True)),
            np.asarray(EK._ref_gather(idx, maskf, nodes)), atol=5e-5,
            rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(EK._pallas_aggregate(idx, maskf, msgs, 40, interpret=True)),
            np.asarray(EK._ref_aggregate(idx, maskf, msgs, 40)),
            atol=5e-5, rtol=2e-5)


def test_vjp_transpose_identity():
    """<gather(n), m> == <n, aggregate(m)> — the identity the custom VJPs
    rely on (each is the other's transpose)."""
    idx, maskf, nodes, msgs = _data(seed=3)
    lhs = jnp.sum(EK._ref_gather(idx, maskf, nodes) * msgs)
    rhs = jnp.sum(nodes * EK._ref_aggregate(idx, maskf, msgs, 40))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_bf16_payload_exact_and_dtype_preserving():
    """bf16 payloads take the single-pass MXU path: exact (one-hot rows
    select single bf16 values, f32 accumulate), gather output keeps the
    payload dtype, and the VJP cotangent comes back in the primal dtype
    (the f32-grad-for-bf16-primal bug)."""
    idx, maskf, nodes, msgs = _data(seed=7)
    nb, mb = nodes.astype(jnp.bfloat16), msgs.astype(jnp.bfloat16)

    out = EK._pallas_gather(idx, maskf, nb, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out, np.float32),
        np.asarray(EK._ref_gather(idx, maskf, nb), np.float32))

    agg = EK._pallas_aggregate(idx, maskf, mb, 40, interpret=True)
    assert agg.dtype == jnp.bfloat16  # f32 accumulation, payload-dtype out
    np.testing.assert_allclose(
        np.asarray(agg, np.float32),
        np.asarray(EK._ref_aggregate(idx, maskf, mb, 40), np.float32),
        atol=1e-2, rtol=1e-2)

    g = jax.grad(lambda n: (EK.edge_gather(idx, maskf, n)
                            .astype(jnp.float32) ** 2).sum())(nb)
    assert g.dtype == jnp.bfloat16
    g2 = jax.grad(lambda m: (EK.edge_aggregate(idx, maskf, m, 40) ** 2)
                  .sum())(mb)
    assert g2.dtype == jnp.bfloat16


def test_gradients_match_autodiff_of_reference():
    idx, maskf, nodes, msgs = _data(seed=4)

    def f_custom(n):
        return (EK.edge_gather(idx, maskf, n) ** 2).sum()

    def f_ref(n):
        return (EK._ref_gather(idx, maskf, n) ** 2).sum()

    np.testing.assert_allclose(np.asarray(jax.grad(f_custom)(nodes)),
                               np.asarray(jax.grad(f_ref)(nodes)),
                               atol=5e-5, rtol=2e-5)

    def a_custom(m):
        return jnp.sum(EK.edge_aggregate(idx, maskf, m, 40) ** 2)

    def a_ref(m):
        return jnp.sum(EK._ref_aggregate(idx, maskf, m, 40) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(a_custom)(msgs)),
                               np.asarray(jax.grad(a_ref)(msgs)),
                               atol=5e-5, rtol=2e-5)


def test_edge_kernels_mesh_batch_partitioning():
    """set_kernel_mesh: gather/aggregate shard_map their Pallas branch
    over the batch axis (GSPMD would otherwise all-gather the operands
    and run the kernels replicated per chip)."""
    from jax.experimental import pallas as pl
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from codlad_tpu.kernels import meshing

    idx, maskf, nodes, msgs = _data(seed=7, B=8, E=1100, N=40, F=7)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    shard = NamedSharding(mesh, PartitionSpec("data"))
    idx_s, mask_s, nodes_s, msgs_s = (jax.device_put(v, shard)
                                      for v in (idx, maskf, nodes, msgs))

    orig_call, orig_use = pl.pallas_call, EK._use_pallas
    # the wrappers pass interpret=False explicitly, so override the kwarg
    EK.pl.pallas_call = (
        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))
    EK._use_pallas = lambda: True
    meshing.set_kernel_mesh(mesh)
    try:
        fwd = jax.jit(EK.edge_gather)
        out = fwd(idx_s, mask_s, nodes_s)
        hlo = fwd.lower(idx_s, mask_s, nodes_s).compile().as_text()
        agg = jax.jit(lambda *a: EK.edge_aggregate(*a, 40))(
            idx_s, mask_s, msgs_s)
        gn = jax.jit(jax.grad(lambda n: (EK.edge_gather(idx_s, mask_s, n)
                                         ** 2).sum()))(nodes_s)
    finally:
        EK.pl.pallas_call = orig_call
        EK._use_pallas = orig_use
        meshing.set_kernel_mesh(None)

    assert "all-gather" not in hlo
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(EK._ref_gather(idx, maskf, nodes)),
                               atol=5e-5, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(agg),
        np.asarray(EK._ref_aggregate(idx, maskf, msgs, 40)),
        atol=5e-5, rtol=2e-5)
    want_g = jax.grad(lambda n: (EK._ref_gather(idx, maskf, n) ** 2).sum())(
        nodes)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(want_g),
                               atol=5e-5, rtol=2e-5)
