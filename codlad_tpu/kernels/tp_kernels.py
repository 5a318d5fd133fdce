"""Pallas VMEM kernel for the fused big-lane tensor product (Stage 1).

The XLA tier of the TP reformulation (nn/tensor_product.fused_tp_tables)
materializes three [E, ~700]-wide intermediates in HBM per conv — the
flattened outer product t, the coupling product TR, and the expanded
weights wR — ~6x more HBM traffic than the irreducible inputs/outputs.
At Stage-1 edge counts (~400k directed edges per batch) that's ~3 GB per
conv per pass; this kernel streams each edge tile through VMEM once:

    TR  = sum_b  (x * sh[:, b]) @ C_b        (dsh small matmuls, MXU)
    wR  = w @ EXPW                            (column-duplication matmul)
    out = (wR * TR) @ SUMR                    (one matmul)

(The t concat never exists: the b-loop contracts each dsh slice directly,
which also sidesteps Mosaic's no-minor-dim-merge reshape rule.)

The backward is the same tile program run in reverse — dx, dsh, dw are
all per-edge, so no cross-tile accumulation is needed:

    dprod = dct @ SUMR^T;  dTR = dprod * wR;  dwR = dprod * TR
    dw  = dwR @ EXPW^T
    Db  = dTR @ C_b^T;   dx += sh_b * Db;   dsh_b = rowsum(x * Db)

Tables (CBIG_R split per dsh slice, EXPW, SUMR) are static per irreps
signature and ride as replicated operands resident in VMEM across the
grid.  Off-TPU the XLA formulation runs unchanged (it IS the reference
twin).  Reference being accelerated: models/gcn_nn.py:181-219
(e3nn FullyConnectedTensorProduct inside TensorProductConvLayer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only exists with TPU support compiled in
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from codlad_tpu.kernels.meshing import shard_batched

_TILE_E = 512


def _use_pallas():
    try:
        return jax.default_backend() in ("tpu", "axon") and pltpu is not None
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# reference twin (the XLA big-lane formulation; also the CPU fallback)


def ref_fused_tp(x, sh, w, cbig_r, expw, sumr):
    """x [B,E,din], sh [B,E,dsh], w [B,E,numel] -> [B,E,dout]."""
    dsh = sh.shape[-1]
    hi = jax.lax.Precision.HIGH
    t = jnp.concatenate([x * sh[..., b:b + 1] for b in range(dsh)], axis=-1)
    TR = jnp.dot(t, cbig_r, precision=hi,
                 preferred_element_type=jnp.float32).astype(x.dtype)
    wR = jnp.dot(w, expw, precision=hi,
                 preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.dot(wR * TR, sumr, precision=hi,
                   preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# kernels


def _tp_fwd_kernel(x_ref, sh_ref, w_ref, cbig_ref, expw_ref, sumr_ref,
                   out_ref, *, dsh, din):
    f32 = jnp.float32
    x = x_ref[0]                    # [TE, din]
    w = w_ref[0]                    # [TE, numel]
    # one [TE, dsh*din] @ [dsh*din, R] matmul: a per-b loop contracts only
    # din (12..36) of the MXU's 128 rows per pass — 3..9x wasted passes
    xcat = jnp.concatenate([x * sh_ref[0][:, b][:, None] for b in range(dsh)],
                           axis=1)
    TR = jnp.dot(xcat, cbig_ref[...], preferred_element_type=f32)
    wR = jnp.dot(w, expw_ref[...], preferred_element_type=f32)
    prod = (wR * TR).astype(x.dtype)
    out_ref[0] = jnp.dot(prod, sumr_ref[...],
                         preferred_element_type=f32).astype(out_ref.dtype)


def _tp_bwd_kernel(x_ref, sh_ref, w_ref, cbig_ref, expw_ref, sumr_ref,
                   sumf_ref, bd_ref, dct_ref, dx_ref, dsh_ref, dw_ref,
                   *, dsh, din):
    f32 = jnp.float32
    dt = x_ref.dtype
    x = x_ref[0]
    w = w_ref[0]
    # recompute TR and wR (VMEM-resident, never in HBM) — single big-
    # contraction matmul, same as the forward
    xcat = jnp.concatenate([x * sh_ref[0][:, b][:, None] for b in range(dsh)],
                           axis=1)
    TR = jnp.dot(xcat, cbig_ref[...], preferred_element_type=f32)
    wR = jnp.dot(w, expw_ref[...], preferred_element_type=f32)

    dct = dct_ref[0]                                    # [TE, dout]
    dprod = jax.lax.dot_general(dct.astype(dt), sumr_ref[...],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)   # [TE, R]
    dTR = dprod * wR
    dwR = dprod * TR
    dw_ref[0] = jax.lax.dot_general(dwR.astype(dt), expw_ref[...],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32
                                    ).astype(dw_ref.dtype)
    # Db9 = dTR @ CBIG^T in ONE matmul (contraction over wide R), consumed
    # whole — no unaligned lane slices (a sliced variant measured slower),
    # no per-b loop, and the dsh row-dots become an MXU matmul against a
    # block-ones table instead of 9 VPU cross-lane reductions:
    #   dx[e,f]  = sum_b sh[e,b] * Db9[e, b*din+f]   -> (shcat*Db9) @ SUMF
    #   dsh[e,b] = sum_f x[e,f]  * Db9[e, b*din+f]   -> (xtile*Db9) @ BD
    TE = x.shape[0]
    Db9 = jax.lax.dot_general(dTR.astype(dt), cbig_ref[...],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)  # [TE, dsh*din]
    shcat = jnp.concatenate(
        [jnp.broadcast_to(sh_ref[0][:, b][:, None], (TE, din))
         for b in range(dsh)], axis=1).astype(f32)
    xtile = jnp.concatenate([x.astype(f32)] * dsh, axis=1)
    dx_ref[0] = jnp.dot((shcat * Db9).astype(dt), sumf_ref[...],
                        preferred_element_type=f32).astype(dx_ref.dtype)
    dsh_ref[0] = jnp.dot((xtile * Db9).astype(dt), bd_ref[...],
                         preferred_element_type=f32).astype(dsh_ref.dtype)


def _pad_e(arrs, E, tile):
    pad = (-E) % tile
    if pad == 0:
        return arrs, E
    return [jnp.pad(a, ((0, 0), (0, pad), (0, 0))) for a in arrs], E + pad


def _tp_cost(B, EP, din, dsh, numel, R, dout):
    flops = 2 * B * EP * (dsh * din * R + numel * R + R * dout)
    bytes_acc = B * EP * (din + dsh + numel + dout) * 2
    return pl.CostEstimate(flops=int(flops), bytes_accessed=int(bytes_acc),
                           transcendentals=0)


def _pallas_fused_tp(x, sh, w, cbig_r, expw, sumr):
    B, E, din = x.shape
    dsh = sh.shape[-1]
    numel = w.shape[-1]
    R = cbig_r.shape[-1]
    dout = sumr.shape[-1]
    dt = x.dtype
    (x, sh, w), EP = _pad_e([x, sh, w], E, _TILE_E)
    grid = (B, EP // _TILE_E)

    out = pl.pallas_call(
        functools.partial(_tp_fwd_kernel, dsh=dsh, din=din),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TILE_E, din), lambda b, e: (b, e, 0)),
            pl.BlockSpec((1, _TILE_E, dsh), lambda b, e: (b, e, 0)),
            pl.BlockSpec((1, _TILE_E, numel), lambda b, e: (b, e, 0)),
            pl.BlockSpec((dsh * din, R), lambda b, e: (0, 0)),
            pl.BlockSpec((numel, R), lambda b, e: (0, 0)),
            pl.BlockSpec((R, dout), lambda b, e: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _TILE_E, dout), lambda b, e: (b, e, 0)),
        out_shape=jax.ShapeDtypeStruct((B, EP, dout), dt),
        cost_estimate=_tp_cost(B, EP, din, dsh, numel, R, dout),
    )(x, sh.astype(dt), w.astype(dt), cbig_r.astype(dt), expw.astype(dt),
      sumr.astype(dt))
    return out[:, :E]


@functools.lru_cache(maxsize=None)
def _bwd_sum_tables(dsh, din):
    """SUMF [dsh*din, din]: sums the b-blocks of Db9 into dx columns;
    BD [dsh*din, dsh]: block-ones turning per-row dots into a matmul."""
    sumf = np.zeros((dsh * din, din), np.float32)
    bd = np.zeros((dsh * din, dsh), np.float32)
    for b in range(dsh):
        sumf[b * din:(b + 1) * din, :] = np.eye(din, dtype=np.float32)
        bd[b * din:(b + 1) * din, b] = 1.0
    return sumf, bd


def _pallas_fused_tp_bwd(x, sh, w, cbig_r, expw, sumr, dct):
    B, E, din = x.shape
    dsh = sh.shape[-1]
    numel = w.shape[-1]
    R = cbig_r.shape[-1]
    dout = sumr.shape[-1]
    dt = x.dtype
    (x, sh, w, dct), EP = _pad_e([x, sh, w, dct], E, _TILE_E)
    grid = (B, EP // _TILE_E)
    sumf_np, bd_np = _bwd_sum_tables(dsh, din)
    sumf, bd = jnp.asarray(sumf_np, dt), jnp.asarray(bd_np, dt)

    dx, dsh_out, dw = pl.pallas_call(
        functools.partial(_tp_bwd_kernel, dsh=dsh, din=din),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TILE_E, din), lambda b, e: (b, e, 0)),
            pl.BlockSpec((1, _TILE_E, dsh), lambda b, e: (b, e, 0)),
            pl.BlockSpec((1, _TILE_E, numel), lambda b, e: (b, e, 0)),
            pl.BlockSpec((dsh * din, R), lambda b, e: (0, 0)),
            pl.BlockSpec((numel, R), lambda b, e: (0, 0)),
            pl.BlockSpec((R, dout), lambda b, e: (0, 0)),
            pl.BlockSpec((dsh * din, din), lambda b, e: (0, 0)),
            pl.BlockSpec((dsh * din, dsh), lambda b, e: (0, 0)),
            pl.BlockSpec((1, _TILE_E, dout), lambda b, e: (b, e, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _TILE_E, din), lambda b, e: (b, e, 0)),
            pl.BlockSpec((1, _TILE_E, dsh), lambda b, e: (b, e, 0)),
            pl.BlockSpec((1, _TILE_E, numel), lambda b, e: (b, e, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, EP, din), dt),
                   jax.ShapeDtypeStruct((B, EP, dsh), dt),
                   jax.ShapeDtypeStruct((B, EP, numel), dt)],
        cost_estimate=_tp_cost(B, EP, din, dsh, numel, R, dout),
    )(x, sh.astype(dt), w.astype(dt), cbig_r.astype(dt), expw.astype(dt),
      sumr.astype(dt), sumf, bd, dct.astype(dt))
    return dx[:, :E], dsh_out[:, :E], dw[:, :E]


# ---------------------------------------------------------------------------
# public API


def _flat3(a):
    """[B, L, S, F] -> [B, L*S, F] (leading-dim merge only)."""
    return a.reshape(a.shape[0], a.shape[1] * a.shape[2], a.shape[3])


@jax.custom_vjp
def fused_tp(x, sh, w, cbig_r, expw, sumr):
    """Edge-batched fused tensor product: x (din) ⊗ sh (dsh) -> dout with
    per-edge weights w; tables from nn.tensor_product.fused_tp_tables.
    4-d operands (the dense atom<->CG cross graphs, [B, L, 14, *]) are
    flattened to [B, L*14, *] so they ride the same VMEM kernel."""
    if _use_pallas() and x.ndim == 4:
        impl = shard_batched(_pallas_fused_tp, (1, 1, 1, 0, 0, 0))
        out = impl(_flat3(x), _flat3(sh), _flat3(w), cbig_r, expw, sumr)
        return out.reshape(x.shape[:3] + (out.shape[-1],))
    if _use_pallas() and x.ndim == 3:
        return shard_batched(_pallas_fused_tp, (1, 1, 1, 0, 0, 0))(
            x, sh, w, cbig_r, expw, sumr)
    return ref_fused_tp(x, sh, w, cbig_r, expw, sumr)


def _fused_tp_fwd(x, sh, w, cbig_r, expw, sumr):
    out = fused_tp(x, sh, w, cbig_r, expw, sumr)
    return out, (x, sh, w, cbig_r, expw, sumr)


def _fused_tp_bwd(res, ct):
    x, sh, w, cbig_r, expw, sumr = res
    if _use_pallas() and x.ndim == 4:
        bwd = shard_batched(_pallas_fused_tp_bwd, (1, 1, 1, 0, 0, 0, 1),
                            out_psum_flags=(0, 0, 0))
        dx, dsh, dw = bwd(_flat3(x), _flat3(sh), _flat3(w),
                          cbig_r, expw, sumr, _flat3(ct))
        return (dx.reshape(x.shape).astype(x.dtype),
                dsh.reshape(sh.shape).astype(sh.dtype),
                dw.reshape(w.shape).astype(w.dtype), None, None, None)
    if _use_pallas() and x.ndim == 3:
        dx, dsh, dw = shard_batched(
            _pallas_fused_tp_bwd, (1, 1, 1, 0, 0, 0, 1),
            out_psum_flags=(0, 0, 0))(x, sh, w, cbig_r, expw, sumr, ct)
        return (dx.astype(x.dtype), dsh.astype(sh.dtype), dw.astype(w.dtype),
                None, None, None)
    _, vjp = jax.vjp(lambda x, sh, w: ref_fused_tp(x, sh, w, cbig_r, expw,
                                                   sumr), x, sh, w)
    dx, dsh, dw = vjp(ct)
    return dx, dsh, dw, None, None, None


fused_tp.defvjp(_fused_tp_fwd, _fused_tp_bwd)
