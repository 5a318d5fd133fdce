"""Pallas kernel tests (interpret mode on CPU) vs reference implementations.

Covers forwards AND the fused Pallas backwards: `_force_pallas` patches both
the backend check and pallas_call so the real kernels (including the
backward kernels) run interpreted on CPU, and gradients are compared against
JAX autodiff of the pure-JAX twins.
"""

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from codlad_tpu.kernels import mpnn_kernels as MK

pytestmark = pytest.mark.slow  # Pallas interpret-mode sweeps + 8-device mesh partitioning


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


@contextlib.contextmanager
def _force_pallas():
    """Run the real Pallas kernels (fwd + bwd) interpreted on CPU."""
    orig_call = pl.pallas_call
    orig_use = MK._use_pallas
    MK.pl.pallas_call = functools.partial(orig_call, interpret=True)
    MK._use_pallas = lambda: True
    try:
        yield
    finally:
        MK.pl.pallas_call = orig_call
        MK._use_pallas = orig_use


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


def _onehot(idx, L):
    B = idx.shape[0]
    return jax.nn.one_hot(idx.reshape(B, -1), L, dtype=jnp.float32)


@pytest.mark.parametrize("sel", ["onehot", "iota"])
def test_pallas_sum_kernel_interpret(sel):
    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs()
    oh = _onehot(idx, E.shape[1]) if sel == "onehot" else None
    with _force_pallas():
        got = MK._pallas_message_sum(A, E, Gn, idx, oh, mask, W_e, W2, b2, W3, b3, 30.0)
    want = MK._ref_message_sum(A, E, Gn, idx, mask, W_e, W2, b2, W3, b3, 30.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("sel", ["onehot", "iota"])
def test_pallas_edge_kernel_interpret(sel):
    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs()
    oh = _onehot(idx, E.shape[1]) if sel == "onehot" else None
    with _force_pallas():
        got = MK._pallas_message_edge(A, E, Gn, idx, oh, W_e, W2, b2, W3, b3)
    want = MK._ref_message(A, E, Gn, idx, W_e, W2, b2, W3, b3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_fused_message_sum_gradients_fallback():
    """custom_vjp fallback (non-TPU path) == autodiff of the twin."""
    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs(B=1, L=8, K=4)

    def loss_fused(A, E, Gn, W2):
        return MK.fused_message_sum(A, E, Gn, idx, None, mask, W_e, W2, b2, W3, b3, 30.0).sum()

    def loss_ref(A, E, Gn, W2):
        return MK._ref_message_sum(A, E, Gn, idx, mask, W_e, W2, b2, W3, b3, 30.0).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(A, E, Gn, W2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(A, E, Gn, W2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("sel", ["onehot", "iota"])
def test_pallas_sum_backward_kernel(sel):
    """The fused Pallas backward (VMEM recompute) == autodiff of the twin,
    for every differentiable input including weights and biases."""
    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs(B=2, L=8, K=4, seed=3)
    oh = _onehot(idx, E.shape[1]) if sel == "onehot" else None

    def loss(args):
        A, E, Gn, W_e, W2, b2, W3, b3 = args
        out = MK.fused_message_sum(A, E, Gn, idx, oh, mask, W_e, W2, b2, W3, b3, 30.0)
        return (out * jnp.cos(jnp.arange(out.size).reshape(out.shape))).sum()

    def loss_ref(args):
        A, E, Gn, W_e, W2, b2, W3, b3 = args
        out = MK._ref_message_sum(A, E, Gn, idx, mask, W_e, W2, b2, W3, b3, 30.0)
        return (out * jnp.cos(jnp.arange(out.size).reshape(out.shape))).sum()

    args = (A, E, Gn, W_e, W2, b2, W3, b3)
    with _force_pallas():
        got = jax.grad(loss)(args)
    want = jax.grad(loss_ref)(args)
    for name, a, b in zip("A E Gn W_e W2 b2 W3 b3".split(), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_pallas_edge_backward_kernel():
    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs(B=2, L=8, K=4, seed=4)

    def loss(fused):
        def f(args):
            A, E, Gn, W_e, W2, b2, W3, b3 = args
            if fused:
                out = MK.fused_message_edge(A, E, Gn, idx, None, W_e, W2, b2, W3, b3)
            else:
                out = MK._ref_message(A, E, Gn, idx, W_e, W2, b2, W3, b3).astype(E.dtype)
            return (out * jnp.sin(0.1 * jnp.arange(out.size).reshape(out.shape))).sum()
        return f

    args = (A, E, Gn, W_e, W2, b2, W3, b3)
    with _force_pallas():
        got = jax.grad(loss(True))(args)
    want = jax.grad(loss(False))(args)
    for name, a, b in zip("A E Gn W_e W2 b2 W3 b3".split(), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_pallas_edge_lnmod_backward_kernel():
    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs(B=2, L=8, K=4, seed=5)
    rng = np.random.default_rng(9)
    B, H = A.shape[0], A.shape[-1]
    sh = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    sc = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    def loss(fused):
        def f(args):
            A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g = args
            fn = (MK.fused_message_edge_lnmod if fused
                  else functools.partial(MK._ref_message_edge_lnmod))
            if fused:
                out = MK.fused_message_edge_lnmod(A, E, Gn, idx, None, W_e, W2, b2, W3, b3, sh, sc, g)
            else:
                out = MK._ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3, sh, sc, g)
            w = jnp.cos(0.05 * jnp.arange(out.size).reshape(out.shape))
            return (out * w).sum()
        return f

    args = (A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g)
    with _force_pallas():
        got = jax.grad(loss(True))(args)
    want = jax.grad(loss(False))(args)
    names = "A E Gn W_e W2 b2 W3 b3 sh sc g".split()
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_edge_lnmod_kernel_interpret_matches_reference():
    """Fused edge-chain + LayerNorm + adaLN epilogue kernel == reference
    twin (interpret mode)."""
    rng = np.random.default_rng(0)
    B, L, K, H = 2, 16, 4, 128
    A = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    E = jnp.asarray(rng.normal(size=(B, L, K, H)).astype(np.float32))
    Gn = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, L, (B, L, K)).astype(np.int32))
    W_e = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.05)
    W2 = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.05)
    W3 = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.05)
    b2 = jnp.zeros(H)
    b3 = jnp.zeros(H)
    sh = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    sc = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    ref = MK._ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                     sh, sc, g)
    oh = _onehot(idx, L)
    with _force_pallas():
        out = MK._pallas_message_edge_lnmod(A, E, Gn, idx, oh, W_e, W2, b2,
                                            W3, b3, sh, sc, g)
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


def test_dec_layer_edge_scale_fold_equivalent():
    """edge_scale=c on h_E == passing c*h_E explicitly (W_e linearity)."""
    from codlad_tpu.nn.mpnn import DecLayerDiffusion, make_neighbor_gather

    rng = np.random.default_rng(2)
    B, L, K, H = 2, 8, 4, 16
    h_V = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    h_E = jnp.asarray(rng.normal(size=(B, L, K, H)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    nbr = make_neighbor_gather(
        jnp.asarray(rng.integers(0, L, (B, L, K)).astype(np.int32)))
    c = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    layer = DecLayerDiffusion(H, H * 3, dropout=0.0)
    params = layer.init(jax.random.PRNGKey(0), h_V, nbr, h_E, s, v, c=c)
    params = jax.tree.map(lambda p: p + 0.05 * np.float32(1.0), params)
    out1 = layer.apply(params, h_V, nbr, 2.0 * h_E, s, v, c=c)
    out2 = layer.apply(params, h_V, nbr, h_E, s, v, c=c, edge_scale=2.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def _force_tp_pallas():
    import contextlib

    from codlad_tpu.kernels import tp_kernels as TK

    @contextlib.contextmanager
    def ctx():
        orig_call = pl.pallas_call
        orig_use = TK._use_pallas
        TK.pl.pallas_call = functools.partial(orig_call, interpret=True)
        TK._use_pallas = lambda: True
        try:
            yield TK
        finally:
            TK.pl.pallas_call = orig_call
            TK._use_pallas = orig_use
    return ctx()


def _tp_inputs(B=2, E=40, seed=0):
    from codlad_tpu.nn.irreps import Irreps
    from codlad_tpu.nn.tensor_product import fused_tp_tables

    in_ir = Irreps("12x0e+4x1o+4x1e+12x0o")
    sh_ir = Irreps("1x0e+1x1o+1x2e")
    out_ir = in_ir
    tb = fused_tp_tables(tuple(in_ir), tuple(sh_ir), tuple(out_ir))
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, E, in_ir.dim)).astype(np.float32))
    sh = jnp.asarray(rng.normal(size=(B, E, sh_ir.dim)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(B, E, tb["numel"])).astype(np.float32) * 0.2)
    cbig_r = jnp.asarray(tb["CBIG_R"])
    expw = jnp.asarray(tb["EXPW"])
    sumr = jnp.asarray(tb["SUMR"])
    return x, sh, w, cbig_r, expw, sumr


def test_pallas_fused_tp_forward():
    """VMEM TP kernel == the XLA big-lane formulation (interpret mode),
    incl. the non-tile-multiple edge-count padding path."""
    from codlad_tpu.kernels import tp_kernels as TK

    x, sh, w, cbig_r, expw, sumr = _tp_inputs()
    want = TK.ref_fused_tp(x, sh, w, cbig_r, expw, sumr)
    with _force_tp_pallas() as TKf:
        got = TKf._pallas_fused_tp(x, sh, w, cbig_r, expw, sumr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_pallas_fused_tp_backward():
    """VMEM TP backward kernel == autodiff of the XLA formulation."""
    from codlad_tpu.kernels import tp_kernels as TK

    x, sh, w, cbig_r, expw, sumr = _tp_inputs(seed=7)

    def loss_p(args):
        x, sh, w = args
        out = TK.fused_tp(x, sh, w, cbig_r, expw, sumr)
        return (out * jnp.sin(0.1 * jnp.arange(out.size).reshape(out.shape))).sum()

    def loss_r(args):
        x, sh, w = args
        out = TK.ref_fused_tp(x, sh, w, cbig_r, expw, sumr)
        return (out * jnp.sin(0.1 * jnp.arange(out.size).reshape(out.shape))).sum()

    with _force_tp_pallas():
        got = jax.grad(loss_p)((x, sh, w))
    want = jax.grad(loss_r)((x, sh, w))
    for name, a, b in zip("x sh w".split(), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_pallas_fused_tp_4d_cross_graph():
    """4-d operands (dense atom<->CG cross graph, [B, L, S, F]) flatten
    to [B, L*S, F] and ride the VMEM kernel — forward and gradients match
    the XLA reference twin."""
    from codlad_tpu.kernels import tp_kernels as TK

    x, sh, w, cbig_r, expw, sumr = _tp_inputs(B=2, E=42, seed=3)
    to4 = lambda a: a.reshape(2, 7, 6, a.shape[-1])
    x4, sh4, w4 = map(to4, (x, sh, w))

    want = TK.ref_fused_tp(x4, sh4, w4, cbig_r, expw, sumr)

    def loss(args, f):
        out = f(*args, cbig_r, expw, sumr)
        return (out * jnp.cos(0.1 * jnp.arange(out.size).reshape(out.shape))).sum()

    want_g = jax.grad(loss)((x4, sh4, w4), TK.ref_fused_tp)
    with _force_tp_pallas() as TKf:
        got = TKf.fused_tp(x4, sh4, w4, cbig_r, expw, sumr)
        got_g = jax.grad(loss)((x4, sh4, w4), TKf.fused_tp)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    for name, a, b in zip("x sh w".split(), got_g, want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_edge_lnmod_drop_kernel_and_gradients():
    """Dropout fused into the lnmod epilogue (keep mask): forward and all
    gradients match the reference twin with the same mask, in both
    selection modes, and keep=ones equals the no-drop kernel."""
    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs(B=2, L=8, K=4, seed=6)
    rng = np.random.default_rng(11)
    B, H = A.shape[0], A.shape[-1]
    L, K = E.shape[1], E.shape[2]
    sh = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    sc = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    keep = jnp.asarray((rng.random((B, L, K, H)) > 0.3).astype(np.float32)
                       / 0.7)

    def loss(fused, onehot):
        def f(args):
            A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g = args
            if fused:
                out = MK.fused_message_edge_lnmod_drop(
                    A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g,
                    keep)
            else:
                out = MK._ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2,
                                                 W3, b3, sh, sc, g, keep=keep)
            w = jnp.cos(0.05 * jnp.arange(out.size).reshape(out.shape))
            return (out * w).sum()
        return f

    args = (A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g)
    want = jax.grad(loss(False, None))(args)
    names = "A E Gn W_e W2 b2 W3 b3 sh sc g".split()
    for sel in (None, _onehot(idx, L)):
        with _force_pallas():
            out = MK.fused_message_edge_lnmod_drop(
                A, E, Gn, idx, sel, W_e, W2, b2, W3, b3, sh, sc, g, keep)
            got = jax.grad(loss(True, sel))(args)
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(MK._ref_message_edge_lnmod(
                A, E, Gn, idx, W_e, W2, b2, W3, b3, sh, sc, g, keep=keep)),
            atol=2e-3, rtol=2e-3)
        for name, a, b in zip(names, got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3, err_msg=name)

    # keep == ones reduces to the plain lnmod kernel
    ones = jnp.ones((B, L, K, H))
    with _force_pallas():
        a = MK.fused_message_edge_lnmod_drop(A, E, Gn, idx, None, W_e, W2,
                                             b2, W3, b3, sh, sc, g, ones)
        b = MK.fused_message_edge_lnmod(A, E, Gn, idx, None, W_e, W2, b2,
                                        W3, b3, sh, sc, g)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _lnmod_inputs(seed=6):
    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs(B=2, L=8, K=4,
                                                       seed=seed)
    rng = np.random.default_rng(13)
    B, H = A.shape[0], A.shape[-1]
    sh = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    sc = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    return A, E, Gn, idx, W_e, W2, b2, W3, b3, sh, sc, g


def test_pdrop_fallback_matches_host_keep():
    """Non-TPU path of the in-kernel-PRNG dropout variant: forward and
    gradients equal the reference twin with the _host_keep mask."""
    A, E, Gn, idx, W_e, W2, b2, W3, b3, sh, sc, g = _lnmod_inputs()
    seeds = jnp.asarray([101, 202], jnp.int32)
    p = 0.3
    keep = MK._host_keep(seeds, E.shape, p, E.dtype)
    assert 0.0 < float(keep.mean()) < 2.0  # nontrivial mask
    assert set(np.unique(np.asarray(keep))) <= {0.0, np.float32(1 / 0.7)}

    out = MK.fused_message_edge_lnmod_pdrop(
        A, E, Gn, idx, None, W_e, W2, b2, W3, b3, sh, sc, g, seeds, p)
    want = MK._ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                      sh, sc, g, keep=keep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)

    def loss(fused):
        def f(args):
            A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g = args
            if fused:
                o = MK.fused_message_edge_lnmod_pdrop(
                    A, E, Gn, idx, None, W_e, W2, b2, W3, b3, sh, sc, g,
                    seeds, p)
            else:
                o = MK._ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2,
                                               W3, b3, sh, sc, g, keep=keep)
            w = jnp.sin(0.03 * jnp.arange(o.size).reshape(o.shape))
            return (o * w).sum()
        return f

    args = (A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g)
    got = jax.grad(loss(True))(args)
    want_g = jax.grad(loss(False))(args)
    for name, a, b in zip("A E Gn W_e W2 b2 W3 b3 sh sc g".split(),
                          got, want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_pdrop_kernel_plumbing_interpret():
    """The pdrop KERNELS under the TPU-emulating interpreter.  The
    interpreter stubs prng_random_bits to zeros => every element dropped
    (bits < thresh for p>0), so forward AND backward must equal the
    reference with keep=0 — this validates the seed plumbing, the grid
    consistency and the epilogue math; real hardware bits are validated
    by scripts/check_pdrop_tpu.py."""
    from jax.experimental.pallas import tpu as pltpu

    A, E, Gn, idx, W_e, W2, b2, W3, b3, sh, sc, g = _lnmod_inputs(seed=7)
    seeds = jnp.asarray([11, 12], jnp.int32)
    p = 0.25
    zeros = jnp.zeros(E.shape)

    orig_call = pl.pallas_call
    orig_use, orig_use_b = MK._use_pallas, MK._use_pallas_bwd
    MK.pl.pallas_call = functools.partial(
        orig_call, interpret=pltpu.InterpretParams())
    MK._use_pallas = lambda: True
    MK._use_pallas_bwd = lambda: True
    try:
        out = MK.fused_message_edge_lnmod_pdrop(
            A, E, Gn, idx, None, W_e, W2, b2, W3, b3, sh, sc, g, seeds, p)

        def loss(args):
            A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g = args
            o = MK.fused_message_edge_lnmod_pdrop(
                A, E, Gn, idx, None, W_e, W2, b2, W3, b3, sh, sc, g,
                seeds, p)
            w = jnp.cos(0.04 * jnp.arange(o.size).reshape(o.shape))
            return (o * w).sum()

        args = (A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g)
        got = jax.grad(loss)(args)
    finally:
        MK.pl.pallas_call = orig_call
        MK._use_pallas, MK._use_pallas_bwd = orig_use, orig_use_b

    want = MK._ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                      sh, sc, g, keep=zeros)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-3, rtol=2e-3)

    def ref_loss(args):
        A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g = args
        o = MK._ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                       sh, sc, g, keep=zeros)
        w = jnp.cos(0.04 * jnp.arange(o.size).reshape(o.shape))
        return (o * w).sum()

    want_g = jax.grad(ref_loss)((A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g))
    for name, a, b in zip("A E Gn W_e W2 b2 W3 b3 sh sc g".split(),
                          got, want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_kernel_mesh_batch_partitioning():
    """set_kernel_mesh: the fused ops shard_map their Pallas branch over
    the batch axis.  Without it, GSPMD has no partitioning rule for
    pallas_call and ALL-GATHERS the [B, L, K, H] operands, running every
    kernel fully replicated on every chip.  Checks: (a) results and
    gradients (incl. the psum'd weight grads) match the reference on
    batch-sharded inputs, (b) the lowered HLO contains no all-gather of
    the edge tensor, (c) batch-dim outputs come back sharded."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    A, E, Gn, idx, mask, W_e, W2, b2, W3, b3 = _inputs(B=8, L=8, K=4,
                                                       seed=21)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    shard = NamedSharding(mesh, PartitionSpec("data"))
    A_s, E_s, Gn_s, idx_s, mask_s = (jax.device_put(v, shard)
                                     for v in (A, E, Gn, idx, mask))

    def loss(args):
        A, E, Gn, W_e, W2, b2, W3, b3 = args
        out = MK.fused_message_sum(A, E, Gn, idx_s, None, mask_s,
                                   W_e, W2, b2, W3, b3, 30.0)
        w = jnp.sin(0.02 * jnp.arange(out.size).reshape(out.shape))
        return (out * w).sum()

    fwd = jax.jit(lambda *a: MK.fused_message_sum(*a, 30.0))
    args = (A_s, E_s, Gn_s, W_e, W2, b2, W3, b3)
    with _force_pallas():
        MK.set_kernel_mesh(mesh)
        try:
            out = fwd(A_s, E_s, Gn_s, idx_s, None, mask_s,
                      W_e, W2, b2, W3, b3)
            hlo = fwd.lower(A_s, E_s, Gn_s, idx_s, None, mask_s, W_e, W2,
                            b2, W3, b3).compile().as_text()
            got_g = jax.jit(jax.grad(loss))(args)
        finally:
            MK.set_kernel_mesh(None)

    want = MK._ref_message_sum(A, E, Gn, idx, mask, W_e, W2, b2, W3, b3,
                               30.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    assert "all-gather" not in hlo, "kernel operands were all-gathered"
    assert out.sharding.spec == PartitionSpec("data",)

    def ref_loss(args):
        A, E, Gn, W_e, W2, b2, W3, b3 = args
        out = MK._ref_message_sum(A, E, Gn, idx, mask, W_e, W2, b2, W3,
                                  b3, 30.0)
        w = jnp.sin(0.02 * jnp.arange(out.size).reshape(out.shape))
        return (out * w).sum()

    want_g = jax.grad(ref_loss)((A, E, Gn, W_e, W2, b2, W3, b3))
    for name, a, b in zip("A E Gn W_e W2 b2 W3 b3".split(), got_g, want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_kernel_mesh_lnmod_and_pdrop():
    """The adaLN-fused op and the in-kernel-PRNG dropout op under the
    registered mesh: batch-sharded execution, correct grads."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec
    from jax.experimental.pallas import tpu as pltpu

    A, E, Gn, idx, W_e, W2, b2, W3, b3, sh, sc, g = _lnmod_inputs(seed=9)
    # widen to B=8 by tiling
    r = 4
    tile = lambda v: jnp.concatenate([v] * r, axis=0)
    A, E, Gn, idx, sh, sc, g = map(tile, (A, E, Gn, idx, sh, sc, g))
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    shard = NamedSharding(mesh, PartitionSpec("data"))
    A_s, E_s, Gn_s, idx_s, sh_s, sc_s, g_s = (
        jax.device_put(v, shard) for v in (A, E, Gn, idx, sh, sc, g))

    def loss(args):
        A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g = args
        out = MK.fused_message_edge_lnmod(A, E, Gn, idx_s, None, W_e, W2,
                                          b2, W3, b3, sh, sc, g)
        w = jnp.cos(0.03 * jnp.arange(out.size).reshape(out.shape))
        return (out * w).sum()

    args = (A_s, E_s, Gn_s, W_e, W2, b2, W3, b3, sh_s, sc_s, g_s)
    with _force_pallas():
        MK.set_kernel_mesh(mesh)
        try:
            out = jax.jit(MK.fused_message_edge_lnmod)(
                A_s, E_s, Gn_s, idx_s, None, W_e, W2, b2, W3, b3,
                sh_s, sc_s, g_s)
            got_g = jax.jit(jax.grad(loss))(args)
        finally:
            MK.set_kernel_mesh(None)

    want = MK._ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                      sh, sc, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-3, rtol=2e-3)

    def ref_loss(args):
        A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g = args
        out = MK._ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3,
                                         b3, sh, sc, g)
        w = jnp.cos(0.03 * jnp.arange(out.size).reshape(out.shape))
        return (out * w).sum()

    want_g = jax.grad(ref_loss)((A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g))
    for name, a, b in zip("A E Gn W_e W2 b2 W3 b3 sh sc g".split(),
                          got_g, want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)

    # the dropout variant under the mesh, via the keep-mask form (same
    # shard_map wrapper shape as pdrop: a 14th batch-leading operand).
    # pdrop's hardware-PRNG form can't run here: the TPU-emulating
    # interpreter's device-barrier clocks livelock under shard_map (and
    # plain interpret lacks prng_seed) — its on-mesh behavior is covered
    # by the single-chip TPU check in scripts/check_pdrop_tpu.py plus
    # this wrapper-shape test.
    rng2 = np.random.default_rng(5)
    keep = jnp.asarray(
        (rng2.random(E.shape) > 0.3).astype(np.float32) / 0.7)
    keep_s = jax.device_put(keep, shard)
    with _force_pallas():
        MK.set_kernel_mesh(mesh)
        try:
            out_p = jax.jit(MK.fused_message_edge_lnmod_drop)(
                A_s, E_s, Gn_s, idx_s, None, W_e, W2, b2, W3, b3,
                sh_s, sc_s, g_s, keep_s)
        finally:
            MK.set_kernel_mesh(None)
    want_p = MK._ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3,
                                        b3, sh, sc, g, keep=keep)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(want_p),
                               atol=2e-3, rtol=2e-3)


def test_tp_kernel_mesh_batch_partitioning():
    """fused_tp under set_kernel_mesh: batch-sharded VMEM TP execution
    (forward + backward; per-edge TP weight grads stay batch-leading,
    so no psum is involved)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from codlad_tpu.kernels import meshing
    from codlad_tpu.kernels import tp_kernels as TK

    x, sh, w, cbig_r, expw, sumr = _tp_inputs(B=8, E=40, seed=3)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    shard = NamedSharding(mesh, PartitionSpec("data"))
    x_s, sh_s, w_s = (jax.device_put(v, shard) for v in (x, sh, w))

    def loss(fn):
        def f(args):
            x, sh, w = args
            out = fn(x, sh, w, cbig_r, expw, sumr)
            wt = jnp.sin(0.1 * jnp.arange(out.size).reshape(out.shape))
            return (out * wt).sum()
        return f

    with _force_tp_pallas() as TKf:
        meshing.set_kernel_mesh(mesh)
        try:
            got = jax.jit(TKf.fused_tp)(x_s, sh_s, w_s, cbig_r, expw, sumr)
            got_g = jax.jit(jax.grad(loss(TKf.fused_tp)))((x_s, sh_s, w_s))
        finally:
            meshing.set_kernel_mesh(None)

    want = TK.ref_fused_tp(x, sh, w, cbig_r, expw, sumr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    want_g = jax.grad(loss(TK.ref_fused_tp))((x, sh, w))
    for name, a, b in zip("x sh w".split(), got_g, want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3, err_msg=name)


def test_pdrop_zero_rate_falls_through():
    """p == 0 routes to the plain lnmod op on every backend (the kernels'
    seed plumbing is keyed on p > 0)."""
    A, E, Gn, idx, W_e, W2, b2, W3, b3, sh, sc, g = _lnmod_inputs(seed=12)
    seeds = jnp.asarray([5, 6], jnp.int32)
    a = MK.fused_message_edge_lnmod_pdrop(
        A, E, Gn, idx, None, W_e, W2, b2, W3, b3, sh, sc, g, seeds, 0.0)
    b = MK.fused_message_edge_lnmod(A, E, Gn, idx, None, W_e, W2, b2, W3,
                                    b3, sh, sc, g)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    with _force_pallas():
        a = MK.fused_message_edge_lnmod_pdrop(
            A, E, Gn, idx, None, W_e, W2, b2, W3, b3, sh, sc, g, seeds, 0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                               rtol=2e-3)


def test_pdrop_xla_bwd_hook_uses_forward_mask():
    """CODLAD_PALLAS_BWD=0 with a Pallas forward: the fallback backward
    must differentiate under the mask the FORWARD applied (materialized
    via the kernel's debug output), not a fresh threefry draw.  Under the
    TPU-emulating interpreter bits are zeros => keep=0, so the gradients
    must equal the reference's with keep=0."""
    from jax.experimental.pallas import tpu as pltpu

    A, E, Gn, idx, W_e, W2, b2, W3, b3, sh, sc, g = _lnmod_inputs(seed=14)
    seeds = jnp.asarray([21, 22], jnp.int32)
    p = 0.25
    zeros = jnp.zeros(E.shape)

    orig_call = pl.pallas_call
    orig_use, orig_use_b = MK._use_pallas, MK._use_pallas_bwd
    MK.pl.pallas_call = functools.partial(
        orig_call, interpret=pltpu.InterpretParams())
    MK._use_pallas = lambda: True
    MK._use_pallas_bwd = lambda: False   # the A/B hook
    try:
        def loss(args):
            A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g = args
            o = MK.fused_message_edge_lnmod_pdrop(
                A, E, Gn, idx, None, W_e, W2, b2, W3, b3, sh, sc, g,
                seeds, p)
            w = jnp.cos(0.04 * jnp.arange(o.size).reshape(o.shape))
            return (o * w).sum()

        got = jax.grad(loss)((A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g))
    finally:
        MK.pl.pallas_call = orig_call
        MK._use_pallas, MK._use_pallas_bwd = orig_use, orig_use_b

    def ref_loss(args):
        A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g = args
        o = MK._ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                       sh, sc, g, keep=zeros)
        w = jnp.cos(0.04 * jnp.arange(o.size).reshape(o.shape))
        return (o * w).sum()

    want = jax.grad(ref_loss)((A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g))
    for name, a, b in zip("A E Gn W_e W2 b2 W3 b3 sh sc g".split(),
                          got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_fused_edge_then_sum_matches_split_kernels():
    """Layer-pair fusion (fwd-only, sampling path): fused_edge_then_sum
    must equal fused_message_edge_lnmod followed by fused_message_sum on
    its output — both selection modes, f32 and bf16."""
    for dtype in (jnp.float32, jnp.bfloat16):
        A_e, E, G_e, idx, mask, W_e, W2, b2, W3, b3 = _inputs(dtype=dtype)
        A_n, _, G_n, _, _, W_en, W2n, b2n, W3n, b3n = _inputs(seed=7,
                                                              dtype=dtype)
        B, L, K, H = E.shape
        rng = np.random.default_rng(3)
        sh = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1, dtype)
        sc = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1, dtype)
        g = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.5, dtype)
        onehot = jax.nn.one_hot(idx.reshape(B, L * K), L, dtype=dtype)

        # ground truth: the two split pure-JAX twins composed
        e2_ref = MK._ref_message_edge_lnmod(A_e, E, G_e, idx, W_e, W2, b2,
                                            W3, b3, sh, sc, g)
        ns_ref = MK._ref_message_sum(A_n, e2_ref, G_n, idx, mask,
                                     W_en, W2n, b2n, W3n, b3n, 30.0)

        with _force_pallas():
            for oh in (None, onehot):
                e2, ns = MK.fused_edge_then_sum(
                    A_e, E, G_e, idx, oh, W_e, W2, b2, W3, b3, sh, sc, g,
                    A_n, G_n, W_en, W2n, b2n, W3n, b3n, mask, 30.0)
                tol = 5e-2 if dtype == jnp.bfloat16 else 2e-4
                np.testing.assert_allclose(
                    np.asarray(e2, np.float32), np.asarray(e2_ref, np.float32),
                    atol=tol, err_msg=f"e2 {dtype} oh={oh is not None}")
                np.testing.assert_allclose(
                    np.asarray(ns), np.asarray(ns_ref), atol=tol,
                    err_msg=f"ns {dtype} oh={oh is not None}")


def test_denoise_fuse_pairs_matches_unfused():
    """denoise(fuse_pairs=True) — the sampling path with encoder-edge ->
    next-node layer pairs fused — must match the unfused forward, both
    through the pure-JAX fallback and the interpreted Pallas kernel."""
    from codlad_tpu.models.denoiser import MPNNDenoiser, mpnn_diffusion

    model = mpnn_diffusion(input_size=3, learn_sigma=True, dropout=0.0,
                           k_neighbors=8)
    B, L = 2, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    t = jnp.zeros((B,), jnp.int32)
    res = jnp.asarray(rng.integers(0, 20, (B, L)).astype(np.int32))
    cg = jnp.asarray(np.cumsum(3.8 * rng.normal(size=(B, L, 3)), 1).astype(np.float32))
    mask = jnp.ones((B, L), bool).at[:, -3:].set(False)
    params = model.init(jax.random.PRNGKey(0), x, t, res, cg, mask)
    cond = model.apply(params, res, cg, mask,
                       method=MPNNDenoiser.compute_condition)

    ref = model.apply(params, x, t, cond, deterministic=True,
                      method=MPNNDenoiser.denoise)
    fused = model.apply(params, x, t, cond, deterministic=True,
                        fuse_pairs=True, method=MPNNDenoiser.denoise)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-5, err_msg="pure-JAX fallback")

    with _force_pallas():
        fused_k = model.apply(params, x, t, cond, deterministic=True,
                              fuse_pairs=True, method=MPNNDenoiser.denoise)
        ref_k = model.apply(params, x, t, cond, deterministic=True,
                            method=MPNNDenoiser.denoise)
    np.testing.assert_allclose(np.asarray(fused_k), np.asarray(ref_k),
                               atol=2e-4, err_msg="interpreted kernels")
    np.testing.assert_allclose(np.asarray(fused_k), np.asarray(ref),
                               atol=2e-4, err_msg="kernel vs pure-JAX")
