"""Pallas TPU kernels for the MPNN message chains (forward AND backward).

The denoise step's cost is dominated by [B, L, K, H] message tensors
(B=96, L=128, K=64, H=128 -> 100M elements): the XLA path materializes
several of them per chain (pre-activation, two hidden states) in HBM.  The
fused kernels stream the per-edge features through VMEM once:

    pre = A[l]  +  E[l,k] @ W_e  +  G[idx[l,k]]          (gather in VMEM)
    m   = gelu(gelu(pre) @ W2 + b2)
    out[l] = (sum_k mask[l,k] * m[l,k]) @ W3 + ...        (sum variant)

Design points (round 3):
  * The gather's one-hot selection matrix comes in TWO modes, chosen by
    whether the caller provides it: `onehot` as an HBM operand (built
    once per conditioning batch; its per-tile DMA overlaps the MXU so the
    reads are effectively free — device traces show this is the FASTER
    mode, since every chain is bound by serial in-tile compute, not HBM),
    or an on-the-fly iota-compare over the int32 indices in VMEM (zero
    HBM footprint; the right mode when no one-hot is materialized, e.g.
    L > 256 where the [B, L*K, L] matrix stops paying for itself).
  * For the masked-sum variant, W3 is applied AFTER the K-sum: the sum
    commutes with the linear map (sum_k m_k (W3 x_k + b3) =
    W3 sum_k m_k x_k + (sum_k m_k) b3), turning a per-edge [N,H]@[H,H]
    matmul into a per-node [TL,H]@[H,H] one — 64x fewer rows.
  * Each kernel carries a pl.CostEstimate with its true MXU FLOPs so XLA
    cost analysis (and bench.py's MFU figure) sees the Pallas work.
    (Round 2's reported 1.85% MFU was an accounting artifact: cost
    analysis scores pallas_call as 0 FLOPs without an estimate, so only
    the ~30 GFLOP of non-Pallas ops counted; the chains are ~790 GFLOP.)
  * The backwards are Pallas kernels too: they RECOMPUTE the chain
    activations in VMEM (flash-attention-style) instead of replaying the
    pure-JAX forward, which re-materialized three [B, L, K, H] tensors in
    HBM per chain — this is where Stage-2 training perf lives.  They
    reuse the forward's one-hot operand when one exists.

On non-TPU backends the pure-JAX reference implementations run directly
(their take_along_axis gathers are fine on CPU), and the same kernels run
under interpret mode in tests (both selection modes).

Reference for the math being fused: models/protein_mpnn_utils.py:208-318
(EncLayer_diffusion / DecLayer_diffusion message MLPs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.sharding import PartitionSpec as P

try:  # pltpu only exists with TPU support compiled in
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_SQRT_2_OVER_PI = 0.7978845608028654
_GELU_C = 0.044715


def _gelu(x):
    # tanh-approximate gelu: Pallas TPU cannot lower erf/erfc, and the
    # approximation error (~1e-3) is below bf16 resolution anyway.  Used
    # consistently in the kernels, the reference twins, and the backwards.
    return jax.nn.gelu(x, approximate=True)


def _gelu_and_grad(x):
    """gelu(x) and d gelu(x)/dx for the tanh approximation, sharing the
    tanh evaluation (the expensive transcendental)."""
    u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    t = jnp.tanh(u)
    y = 0.5 * x * (1.0 + t)
    dy = 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * _SQRT_2_OVER_PI * (
        1.0 + 3.0 * _GELU_C * x * x)
    return y, dy


def _use_pallas():
    try:
        return jax.default_backend() in ("tpu", "axon") and pltpu is not None
    except Exception:  # pragma: no cover
        return False


def _use_pallas_bwd():
    """A/B hook: CODLAD_PALLAS_BWD=0 keeps the Pallas forwards but routes
    backwards through autodiff of the pure-JAX twin (XLA replay)."""
    import os

    return _use_pallas() and os.environ.get("CODLAD_PALLAS_BWD", "1") != "0"


# multi-chip batch-partitioned kernel execution lives in kernels/meshing.py
# (GSPMD all-gathers pallas_call operands otherwise — see that module);
# re-exported here because this is the kernel module trainers import.
from codlad_tpu.kernels.meshing import (set_kernel_mesh,  # noqa: F401
                                        shard_batched as _shard_batched)


# ---------------------------------------------------------------------------
# reference implementations (ground truth + non-TPU fallback)


def _gather_nbr(Gn, idx):
    # row count comes from idx, not the table: under sequence sharding the
    # node table Gn holds the FULL L while idx covers this shard's rows
    B, _, H = Gn.shape
    M, K = idx.shape[1], idx.shape[-1]
    return jnp.take_along_axis(Gn, idx.reshape(B, M * K, 1), axis=1).reshape(B, M, K, H)


def _ref_message(A, E, Gn, idx, W_e, W2, b2, W3, b3):
    """[B, L, K, H] messages before mask/sum."""
    g = _gather_nbr(Gn, idx)
    pre = A[:, :, None, :] + E @ W_e + g
    x = _gelu(pre) @ W2 + b2
    return _gelu(x) @ W3 + b3


def _ref_message_sum(A, E, Gn, idx, mask, W_e, W2, b2, W3, b3, scale):
    m = _ref_message(A, E, Gn, idx, W_e, W2, b2, W3, b3)
    m = m * mask[..., None].astype(m.dtype)
    # f32 like the pallas kernel's output, so fwd/bwd dtypes agree under
    # bf16 mixed precision
    return (m.sum(axis=2) / scale).astype(jnp.float32)


def _ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                            sh, sc, g, eps=1e-6, keep=None):
    msg = _ref_message(A, E, Gn, idx, W_e, W2, b2, W3, b3)
    if keep is not None:
        msg = msg * keep.astype(msg.dtype)
    resid = (E + msg.astype(E.dtype)).astype(jnp.float32)
    mean = resid.mean(axis=-1, keepdims=True)
    var = ((resid - mean) ** 2).mean(axis=-1, keepdims=True)
    ln = (resid - mean) * jax.lax.rsqrt(var + eps)
    out = g[:, None, None, :] * (ln * (1.0 + sc[:, None, None, :])
                                 + sh[:, None, None, :])
    return out.astype(E.dtype)


# ---------------------------------------------------------------------------
# shared in-kernel helpers


def _inkernel_keep(seed_ref, drop_p, n_rows, H):
    """Dropout keep-scales (0 or 1/(1-p)) generated from the TPU hardware
    PRNG — no HBM mask operand, no XLA-side mask generation.  Seeded from
    the per-sample seed + the L-tile id, so the BACKWARD kernel (same
    grid, same tile size) regenerates the identical mask.  NOTE: plain
    interpret mode stubs prng_random_bits to zeros (=> everything
    dropped); real-bit validation lives in scripts/check_pdrop_tpu.py."""
    pltpu.prng_seed(seed_ref[pl.program_id(0)], pl.program_id(1))
    bits = pltpu.bitcast(pltpu.prng_random_bits((n_rows, H)), jnp.uint32)
    thresh = np.uint32(min(int(drop_p * 2.0 ** 32), 2 ** 32 - 1))
    return (bits >= thresh).astype(jnp.float32) / (1.0 - drop_p)


def _selection(sel_ref, L, dtype, has_oh):
    """The [TL*K, L] one-hot selection matrix for one tile: either read
    straight from the HBM operand (has_oh — the DMA overlaps the MXU) or
    built in VMEM by an iota-compare over the int32 indices."""
    if has_oh:
        return sel_ref[0]                                # [TL*K, L]
    idx = sel_ref[0]                                     # [TL, K]
    TL, K = idx.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (TL, K, L), 2)
    oh = (idx[:, :, None] == iota).astype(dtype)
    return oh.reshape(TL * K, L)                         # leading-dim merge


def _chain_fwd(a_ref, e_ref, oh, g_ref, we_ref, w2_ref, b2_ref):
    """pre -> h2 = gelu(gelu(pre) @ W2 + b2) for one [TL, K] edge tile.
    Returns (pre, x2, h2) in f32 ([TL*K, H]).

    Measured dead end worth recording: keeping the elementwise chain in
    bf16 (f32 MXU accumulators, outputs cast down) LOST ~40% — Mosaic
    wraps narrow VPU ops in pack/unpack, so the f32 interior is faster
    despite double the vector width.  Mosaic also rejects bf16 matmul
    accumulators outright ("matmul acc must be 32-bit")."""
    TL, K, H = e_ref.shape[1], e_ref.shape[2], e_ref.shape[3]
    f32 = jnp.float32
    e = e_ref[0].reshape(TL * K, H)
    g = jnp.dot(oh, g_ref[0], preferred_element_type=f32)
    a = jnp.broadcast_to(a_ref[0][:, None, :].astype(f32),
                         (TL, K, H)).reshape(TL * K, H)
    pre = a + jnp.dot(e, we_ref[...], preferred_element_type=f32) + g
    x2 = jnp.dot(_gelu(pre).astype(e.dtype), w2_ref[...],
                 preferred_element_type=f32) + b2_ref[...].astype(f32)
    return pre, x2, _gelu(x2)


# ---------------------------------------------------------------------------
# forward kernels


def _sum_kernel(sel_ref, a_ref, e_ref, g_ref, mask_ref, we_ref, w2_ref,
                b2_ref, w3_ref, b3_ref, out_ref, *, has_oh):
    TL, K, H = e_ref.shape[1], e_ref.shape[2], e_ref.shape[3]
    L = g_ref.shape[1]
    f32 = jnp.float32
    dt = e_ref.dtype

    # NB: all reshapes merge/split LEADING dims only (Mosaic cannot shape-
    # cast across the minor/lane dimension).
    oh = _selection(sel_ref, L, dt, has_oh)
    _, _, h2 = _chain_fwd(a_ref, e_ref, oh, g_ref, we_ref, w2_ref, b2_ref)
    maskf = mask_ref[0].astype(f32)                      # [TL, K]
    s = (h2.reshape(TL, K, H) * maskf[..., None]).sum(axis=1)   # [TL, H]
    # W3 after the sum (linearity): per-node matmul, K-fold fewer rows
    out = jnp.dot(s.astype(dt), w3_ref[...], preferred_element_type=f32)
    out = out + maskf.sum(axis=1)[:, None] * b3_ref[...].astype(f32)
    out_ref[0] = out.astype(out_ref.dtype)


def _edge_kernel(sel_ref, a_ref, e_ref, g_ref, we_ref, w2_ref, b2_ref,
                 w3_ref, b3_ref, out_ref, *, has_oh):
    TL, K, H = e_ref.shape[1], e_ref.shape[2], e_ref.shape[3]
    L = g_ref.shape[1]
    f32 = jnp.float32
    dt = e_ref.dtype

    oh = _selection(sel_ref, L, dt, has_oh)
    _, _, h2 = _chain_fwd(a_ref, e_ref, oh, g_ref, we_ref, w2_ref, b2_ref)
    x = jnp.dot(h2.astype(dt), w3_ref[...],
                preferred_element_type=f32) + b3_ref[...].astype(f32)
    out_ref[0] = x.reshape(TL, K, H).astype(out_ref.dtype)


def _edge_lnmod_kernel(sel_ref, a_ref, e_ref, g_ref, we_ref, w2_ref, b2_ref,
                       w3_ref, b3_ref, sh_ref, sc_ref, gate_ref, *rest,
                       has_oh, has_keep=False, drop_p=0.0, debug_mask=False):
    mask_out_ref = None
    if has_keep:
        keep_ref, out_ref = rest
    elif drop_p > 0.0 and debug_mask:
        seed_ref, out_ref, mask_out_ref = rest
    elif drop_p > 0.0:
        seed_ref, out_ref = rest
    else:
        (out_ref,) = rest
    TL, K, H = e_ref.shape[1], e_ref.shape[2], e_ref.shape[3]
    L = g_ref.shape[1]
    f32 = jnp.float32
    dt = e_ref.dtype

    oh = _selection(sel_ref, L, dt, has_oh)
    _, _, h2 = _chain_fwd(a_ref, e_ref, oh, g_ref, we_ref, w2_ref, b2_ref)
    x = jnp.dot(h2.astype(dt), w3_ref[...],
                preferred_element_type=f32) + b3_ref[...].astype(f32)
    if has_keep:
        # dropout fused into the epilogue: keep holds 0 / 1/(1-p) scales
        x = x * keep_ref[0].reshape(TL * K, H).astype(f32)
    elif drop_p > 0.0:
        # dropout mask generated IN VMEM from the hardware PRNG
        keep = _inkernel_keep(seed_ref, drop_p, TL * K, H)
        x = x * keep
        if mask_out_ref is not None:
            mask_out_ref[0] = keep.reshape(TL, K, H)
    e = e_ref[0].reshape(TL * K, H)
    resid = e.astype(f32) + x
    mean = resid.mean(axis=-1, keepdims=True)
    var = ((resid - mean) ** 2).mean(axis=-1, keepdims=True)
    ln = (resid - mean) * jax.lax.rsqrt(var + 1e-6)
    sh = sh_ref[0].astype(f32)          # [1, H]
    sc = sc_ref[0].astype(f32)
    gate = gate_ref[0].astype(f32)
    out = gate * (ln * (1.0 + sc) + sh)
    out_ref[0] = out.reshape(TL, K, H).astype(out_ref.dtype)


def _edge_then_sum_kernel(sel_ref, ae_ref, e_ref, ge_ref, wee_ref, w2e_ref,
                          b2e_ref, w3e_ref, b3e_ref, sh_ref, sc_ref,
                          gmod_ref, an_ref, gn_ref, wen_ref, w2n_ref,
                          b2n_ref, w3n_ref, b3n_ref, mask_ref,
                          eout_ref, nout_ref, *, has_oh):
    """Layer-pair fusion (forward only): encoder layer i's h_E update
    (edge chain + LN + adaLN modulate) CHAINED INTO the next layer's
    node-message sum, whose edge operand is exactly that h_E output.

    Why: the denoise step is HBM-bound (~4.2 GB/step at B96/L128/K64/H128
    bf16, ~5.2 ms of the 7.7 ms step at 819 GB/s).  Running the two chains
    as one kernel keeps h_E_{i+1} in VMEM for the node chain — saving its
    [B, L, K, H] HBM read — AND reuses the selection tile, saving the
    second [B, L*K, L] one-hot read: ~400 MB less traffic per fused pair.
    The gather matmul itself runs twice (two payload tables); MXU FLOPs
    are unchanged — this is a bandwidth optimization, not a FLOP one.
    """
    TL, K, H = e_ref.shape[1], e_ref.shape[2], e_ref.shape[3]
    L = ge_ref.shape[1]
    f32 = jnp.float32
    dt = e_ref.dtype

    oh = _selection(sel_ref, L, dt, has_oh)
    # ---- edge half: identical math to _edge_lnmod_kernel
    _, _, h2 = _chain_fwd(ae_ref, e_ref, oh, ge_ref, wee_ref, w2e_ref,
                          b2e_ref)
    x = jnp.dot(h2.astype(dt), w3e_ref[...],
                preferred_element_type=f32) + b3e_ref[...].astype(f32)
    e = e_ref[0].reshape(TL * K, H)
    resid = e.astype(f32) + x
    mean = resid.mean(axis=-1, keepdims=True)
    var = ((resid - mean) ** 2).mean(axis=-1, keepdims=True)
    ln = (resid - mean) * jax.lax.rsqrt(var + 1e-6)
    sh = sh_ref[0].astype(f32)
    sc = sc_ref[0].astype(f32)
    gmod = gmod_ref[0].astype(f32)
    e_out = gmod * (ln * (1.0 + sc) + sh)
    # cast through the edge dtype FIRST: numerically identical to the
    # unfused pipeline, where h_E round-trips HBM as `dt`
    e2 = e_out.astype(dt)
    eout_ref[0] = e2.reshape(TL, K, H)

    # ---- node half: _sum_kernel math with E = the in-VMEM h_E output
    g2 = jnp.dot(oh, gn_ref[0], preferred_element_type=f32)
    a2 = jnp.broadcast_to(an_ref[0][:, None, :].astype(f32),
                          (TL, K, H)).reshape(TL * K, H)
    pre = a2 + jnp.dot(e2, wen_ref[...], preferred_element_type=f32) + g2
    x2 = jnp.dot(_gelu(pre).astype(dt), w2n_ref[...],
                 preferred_element_type=f32) + b2n_ref[...].astype(f32)
    h2n = _gelu(x2)
    maskf = mask_ref[0].astype(f32)
    s = (h2n.reshape(TL, K, H) * maskf[..., None]).sum(axis=1)
    nout = jnp.dot(s.astype(dt), w3n_ref[...], preferred_element_type=f32)
    nout = nout + maskf.sum(axis=1)[:, None] * b3n_ref[...].astype(f32)
    nout_ref[0] = nout.astype(nout_ref.dtype)


def _tile_rows(L, K=64, H=128, bytes_per_edge_elem=12, dt=jnp.bfloat16):
    """Largest row tile whose per-edge working set stays well under VMEM
    (double-buffered inputs included in the byte estimate).

    `bytes_per_edge_elem` values were calibrated with bf16 edge payloads;
    `dt` scales them for wider dtypes (f32 training at B=128/L=128 blew
    the 16 MB scoped-vmem limit by 2.45 MB without this — a compile-time
    OOM that interpret-mode CPU tests cannot catch)."""
    budget = 8 * 1024 * 1024
    bytes_per_edge_elem *= max(jnp.dtype(dt).itemsize, 2) / 2
    for tl in (128, 64, 32, 16, 8, 4, 2, 1):
        if L % tl == 0 and tl * K * H * bytes_per_edge_elem <= budget:
            return tl
    return 1


def _chain_cost(B, L, K, H, TL, edge_w3=True, epilogue_elems=0):
    """True MXU FLOPs of one full chain invocation (for pl.CostEstimate):
    gather matmul + W_e + W2 (+ per-edge or per-node W3)."""
    N = B * L * K
    flops = 2 * N * L * H            # one-hot gather contraction
    flops += 2 * N * H * H           # W_e
    flops += 2 * N * H * H           # W2
    flops += 2 * (N if edge_w3 else B * L) * H * H   # W3
    bytes_acc = N * H * 2 * (2 if edge_w3 else 1) + B * L * H * 8
    return pl.CostEstimate(flops=flops, bytes_accessed=int(bytes_acc),
                           transcendentals=2 * N * H + epilogue_elems)


def _sel_operand(idx, onehot, dt, TL):
    """(operand, BlockSpec, has_oh) for the selection input."""
    B, L, K = idx.shape
    if onehot is not None:
        # last dim is the gather-TABLE length (== L except under sequence
        # sharding, where local rows index a full-length table)
        spec = pl.BlockSpec((1, TL * K, onehot.shape[-1]),
                            lambda b, i: (b, i, 0))
        return onehot.astype(dt), spec, True
    spec = pl.BlockSpec((1, TL, K), lambda b, i: (b, i, 0))
    return idx, spec, False


def _common_specs(TL, K, H, N):
    """BlockSpecs shared by every kernel: A, E, Gn.  N is the node-TABLE
    length (Gn.shape[1]) — equal to the row count except under sequence
    sharding."""
    return [
        pl.BlockSpec((1, TL, H), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, TL, K, H), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec((1, N, H), lambda b, i: (b, 0, 0)),
    ]


def _weight_specs(H):
    return [
        pl.BlockSpec((H, H), lambda b, i: (0, 0)),
        pl.BlockSpec((H, H), lambda b, i: (0, 0)),
        pl.BlockSpec((H,), lambda b, i: (0,)),
        pl.BlockSpec((H, H), lambda b, i: (0, 0)),
        pl.BlockSpec((H,), lambda b, i: (0,)),
    ]


def _pallas_message_sum(A, E, Gn, idx, onehot, mask, W_e, W2, b2, W3, b3,
                        scale):
    B, L, K, H = E.shape
    TL = _tile_rows(L, K, H, dt=E.dtype)
    grid = (B, L // TL)
    dt = E.dtype
    sel, sel_spec, has_oh = _sel_operand(idx, onehot, dt, TL)

    out = pl.pallas_call(
        functools.partial(_sum_kernel, has_oh=has_oh),
        grid=grid,
        in_specs=([sel_spec] + _common_specs(TL, K, H, Gn.shape[1])
                  + [pl.BlockSpec((1, TL, K), lambda b, i: (b, i, 0))]
                  + _weight_specs(H)),
        out_specs=pl.BlockSpec((1, TL, H), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, H), jnp.float32),
        cost_estimate=_chain_cost(B, L, K, H, TL, edge_w3=False),
    )(sel, A.astype(dt), E, Gn.astype(dt),
      mask.astype(jnp.float32), W_e.astype(dt), W2.astype(dt), b2,
      W3.astype(dt), b3)
    return out / scale


def _pallas_message_edge(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3):
    B, L, K, H = E.shape
    TL = _tile_rows(L, K, H, dt=E.dtype)
    grid = (B, L // TL)
    dt = E.dtype
    sel, sel_spec, has_oh = _sel_operand(idx, onehot, dt, TL)

    return pl.pallas_call(
        functools.partial(_edge_kernel, has_oh=has_oh),
        grid=grid,
        in_specs=[sel_spec] + _common_specs(TL, K, H, Gn.shape[1]) + _weight_specs(H),
        out_specs=pl.BlockSpec((1, TL, K, H), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, K, H), E.dtype),
        cost_estimate=_chain_cost(B, L, K, H, TL),
    )(sel, A.astype(dt), E, Gn.astype(dt),
      W_e.astype(dt), W2.astype(dt), b2, W3.astype(dt), b3)


def _pallas_edge_then_sum(A_e, E, G_e, idx, onehot, W_e_e, W2_e, b2_e,
                          W3_e, b3_e, sh, sc, gmod, A_n, G_n, W_e_n,
                          W2_n, b2_n, W3_n, b3_n, mask):
    B, L, K, H = E.shape
    # ~2x the lnmod kernel's per-edge working set (two chains resident)
    TL = _tile_rows(L, K, H, bytes_per_edge_elem=24, dt=E.dtype)
    grid = (B, L // TL)
    dt = E.dtype
    sel, sel_spec, has_oh = _sel_operand(idx, onehot, dt, TL)

    mod_spec = pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0))
    node_spec = pl.BlockSpec((1, TL, H), lambda b, i: (b, i, 0))
    table_spec = pl.BlockSpec((1, G_e.shape[1], H), lambda b, i: (b, 0, 0))
    edge_spec = pl.BlockSpec((1, TL, K, H), lambda b, i: (b, i, 0, 0))
    cost = _chain_cost(B, L, K, H, TL, epilogue_elems=B * L * K * H)
    cost2 = pl.CostEstimate(
        # both chains' MXU work; traffic ~= lnmod chain + node sum MINUS
        # the saved E and onehot reads
        flops=2 * cost.flops - 2 * B * L * K * H * H,  # node W3 is per-node
        bytes_accessed=cost.bytes_accessed + B * L * H * 8,
        transcendentals=2 * cost.transcendentals)
    return pl.pallas_call(
        functools.partial(_edge_then_sum_kernel, has_oh=has_oh),
        grid=grid,
        in_specs=([sel_spec, node_spec, edge_spec, table_spec]
                  + _weight_specs(H)
                  + [mod_spec, mod_spec, mod_spec]
                  + [node_spec, table_spec]
                  + _weight_specs(H)
                  + [pl.BlockSpec((1, TL, K), lambda b, i: (b, i, 0))]),
        out_specs=[edge_spec, node_spec],
        out_shape=[jax.ShapeDtypeStruct((B, L, K, H), E.dtype),
                   jax.ShapeDtypeStruct((B, L, H), jnp.float32)],
        cost_estimate=cost2,
    )(sel, A_e.astype(dt), E, G_e.astype(dt),
      W_e_e.astype(dt), W2_e.astype(dt), b2_e, W3_e.astype(dt), b3_e,
      sh.astype(dt)[:, None, :], sc.astype(dt)[:, None, :],
      gmod.astype(dt)[:, None, :],
      A_n.astype(dt), G_n.astype(dt),
      W_e_n.astype(dt), W2_n.astype(dt), b2_n, W3_n.astype(dt), b3_n,
      mask.astype(jnp.float32))


def fused_edge_then_sum(A_e, E, G_e, idx, onehot, W_e_e, W2_e, b2_e, W3_e,
                        b3_e, sh, sc, gmod, A_n, G_n, W_e_n, W2_n, b2_n,
                        W3_n, b3_n, mask, scale):
    """FORWARD-ONLY layer-pair fusion for the sampling path: encoder
    layer i's h_E update (edge chain + LN + adaLN) chained into the next
    layer's node-message masked sum, one selection tile for both gathers.

    Returns (h_E_next [B, L, K, H] in E.dtype, node_sum [B, L, H] f32).
    Numerically identical to
      e2 = fused_message_edge_lnmod(A_e, E, G_e, ...)
      ns = fused_message_sum(A_n, e2, G_n, ..., mask, scale)
    but with ~400 MB/step less HBM traffic at the bench shape (the e2
    round trip and the second one-hot read stay in VMEM).  No VJP is
    defined: training keeps the split kernels (their Pallas backwards);
    use only under stop_gradient/sampling.
    """
    if _use_pallas():
        impl = _shard_batched(
            _pallas_edge_then_sum,
            (1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 1))
        e2, ns = impl(A_e, E, G_e, idx, onehot, W_e_e, W2_e, b2_e, W3_e,
                      b3_e, sh, sc, gmod, A_n, G_n, W_e_n, W2_n, b2_n,
                      W3_n, b3_n, mask)
        return e2, ns / scale
    e2 = _ref_message_edge_lnmod(A_e, E, G_e, idx, W_e_e, W2_e, b2_e,
                                 W3_e, b3_e, sh, sc, gmod)
    ns = _ref_message_sum(A_n, e2, G_n, idx, mask, W_e_n, W2_n, b2_n,
                          W3_n, b3_n, scale)
    return e2, ns


def _pdrop_tile(L, K, H, dt):
    """Shared fwd/bwd tile for the in-kernel-PRNG dropout variant: the
    mask is regenerated per (sample, tile) seed, so the grids MUST match
    for the backward to reproduce the forward's bits.  Sized for the
    backward's working set (the larger of the two).  `dt` must be the
    edge dtype in BOTH directions, or the regenerated bits diverge."""
    return _tile_rows(L, K, H, bytes_per_edge_elem=30, dt=dt)


def _pallas_message_edge_lnmod(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3,
                               sh, sc, g, keep=None, seeds=None, drop_p=0.0,
                               debug_mask=False):
    B, L, K, H = E.shape
    if seeds is not None:
        TL = _pdrop_tile(L, K, H, E.dtype)
    else:
        TL = _tile_rows(L, K, H,
                        bytes_per_edge_elem=14 if keep is not None else 12,
                        dt=E.dtype)
    grid = (B, L // TL)
    dt = E.dtype
    sel, sel_spec, has_oh = _sel_operand(idx, onehot, dt, TL)

    mod_spec = pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0))
    edge_spec = pl.BlockSpec((1, TL, K, H), lambda b, i: (b, i, 0, 0))
    extra_ops, extra_specs = [], []
    if keep is not None:
        extra_ops = [keep.astype(dt)]
        extra_specs = [edge_spec]
    elif seeds is not None:
        extra_ops = [seeds.astype(jnp.int32)]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    out_specs = edge_spec
    out_shape = jax.ShapeDtypeStruct((B, L, K, H), E.dtype)
    if debug_mask:
        out_specs = [edge_spec, edge_spec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, L, K, H), jnp.float32)]
    return pl.pallas_call(
        functools.partial(_edge_lnmod_kernel, has_oh=has_oh,
                          has_keep=keep is not None,
                          drop_p=drop_p if seeds is not None else 0.0,
                          debug_mask=debug_mask),
        grid=grid,
        in_specs=([sel_spec] + _common_specs(TL, K, H, Gn.shape[1]) + _weight_specs(H)
                  + [mod_spec, mod_spec, mod_spec] + extra_specs),
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=_chain_cost(B, L, K, H, TL,
                                  epilogue_elems=B * L * K * H),
    )(sel, A.astype(dt), E, Gn.astype(dt),
      W_e.astype(dt), W2.astype(dt), b2, W3.astype(dt), b3,
      sh.astype(dt)[:, None, :], sc.astype(dt)[:, None, :],
      g.astype(dt)[:, None, :], *extra_ops)


# ---------------------------------------------------------------------------
# backward kernels
#
# Strategy: recompute the chain activations (pre, x2) tile-by-tile in VMEM
# from the saved INPUTS (A, E, Gn, weights) — nothing [B, L, K, H]-sized is
# saved or re-read beyond one pass over E.  Weight gradients accumulate in
# VMEM-resident output blocks across the sequential TPU grid (constant
# index_map); dGn accumulates per-sample over the L-tile grid dimension.


def _bwd_accumulate(ref, value, first):
    @pl.when(first)
    def _():
        ref[...] = jnp.zeros_like(ref)
    ref[...] += value


def _chain_bwd_common(dpre, e, oh, we_ref, b_first, i_first,
                      dwe_ref, dgn_ref, da_ref, de_ref, TL, K, H,
                      de_extra=None):
    """Shared tail of every backward: from d(pre) to dE/dA/dGn/dW_e."""
    f32 = jnp.float32
    dt = e.dtype
    de = jnp.dot(dpre.astype(dt), we_ref[...].T, preferred_element_type=f32)
    if de_extra is not None:
        de = de + de_extra
    de_ref[0] = de.reshape(TL, K, H).astype(de_ref.dtype)
    da_ref[0] = dpre.reshape(TL, K, H).sum(axis=1).astype(da_ref.dtype)
    # scatter-add via the transposed one-hot (a matmul, not a serial store)
    dgn = jax.lax.dot_general(oh, dpre.astype(dt),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    _bwd_accumulate(dgn_ref, dgn[None], i_first)
    dwe = jax.lax.dot_general(e, dpre.astype(dt), (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    _bwd_accumulate(dwe_ref, dwe, b_first & i_first)


def _sum_bwd_kernel(sel_ref, a_ref, e_ref, g_ref, mask_ref, we_ref, w2_ref,
                    b2_ref, w3_ref, dout_ref,
                    da_ref, de_ref, dgn_ref, dwe_ref, dw2_ref, db2_ref,
                    dw3_ref, db3_ref, *, has_oh):
    TL, K, H = e_ref.shape[1], e_ref.shape[2], e_ref.shape[3]
    L = g_ref.shape[1]
    f32 = jnp.float32
    dt = e_ref.dtype
    b_first = pl.program_id(0) == 0
    i_first = pl.program_id(1) == 0

    oh = _selection(sel_ref, L, dt, has_oh)
    pre, x2, h2 = _chain_fwd(a_ref, e_ref, oh, g_ref, we_ref, w2_ref, b2_ref)
    e = e_ref[0].reshape(TL * K, H)
    maskf = mask_ref[0].astype(f32)                      # [TL, K]
    dout = dout_ref[0].astype(f32)                       # [TL, H] (pre-scaled)

    # out = s @ W3 + (sum_k mask) b3, s = sum_k mask * h2
    s = (h2.reshape(TL, K, H) * maskf[..., None]).sum(axis=1)
    ds = jax.lax.dot_general(dout.astype(dt), w3_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dw3 = jax.lax.dot_general(s.astype(dt), dout.astype(dt),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    _bwd_accumulate(dw3_ref, dw3, b_first & i_first)
    _bwd_accumulate(db3_ref, (maskf.sum(axis=1)[:, None] * dout
                              ).sum(axis=0, keepdims=True),
                    b_first & i_first)

    dh2 = (jnp.broadcast_to(ds[:, None, :], (TL, K, H))
           * maskf[..., None]).reshape(TL * K, H)
    _, dg2 = _gelu_and_grad(x2)
    dx2 = dh2 * dg2
    h1, dg1 = _gelu_and_grad(pre)
    dw2 = jax.lax.dot_general(h1.astype(dt), dx2.astype(dt),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    _bwd_accumulate(dw2_ref, dw2, b_first & i_first)
    _bwd_accumulate(db2_ref, dx2.sum(axis=0, keepdims=True),
                    b_first & i_first)
    dh1 = jax.lax.dot_general(dx2.astype(dt), w2_ref[...],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dpre = dh1 * dg1
    _chain_bwd_common(dpre, e, oh, we_ref, b_first, i_first,
                      dwe_ref, dgn_ref, da_ref, de_ref, TL, K, H)


def _edge_bwd_core(pre, x2, h2, e, oh, we_ref, w2_ref, w3_ref, dmsg,
                   da_ref, de_ref, dgn_ref, dwe_ref, dw2_ref,
                   db2_ref, dw3_ref, db3_ref, TL, K, H, de_extra=None):
    """Backward of the per-edge chain given d(msg) [TL*K, H] f32 and the
    already-recomputed activations (pre, x2, h2)."""
    f32 = jnp.float32
    dt = e.dtype
    b_first = pl.program_id(0) == 0
    i_first = pl.program_id(1) == 0

    dh2 = jax.lax.dot_general(dmsg.astype(dt), w3_ref[...],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dw3 = jax.lax.dot_general(h2.astype(dt), dmsg.astype(dt),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    _bwd_accumulate(dw3_ref, dw3, b_first & i_first)
    _bwd_accumulate(db3_ref, dmsg.sum(axis=0, keepdims=True),
                    b_first & i_first)
    _, dg2 = _gelu_and_grad(x2)
    dx2 = dh2 * dg2
    h1, dg1 = _gelu_and_grad(pre)
    dw2 = jax.lax.dot_general(h1.astype(dt), dx2.astype(dt),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    _bwd_accumulate(dw2_ref, dw2, b_first & i_first)
    _bwd_accumulate(db2_ref, dx2.sum(axis=0, keepdims=True),
                    b_first & i_first)
    dh1 = jax.lax.dot_general(dx2.astype(dt), w2_ref[...],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dpre = dh1 * dg1
    _chain_bwd_common(dpre, e, oh, we_ref, b_first, i_first,
                      dwe_ref, dgn_ref, da_ref, de_ref, TL, K, H,
                      de_extra=de_extra)


def _edge_bwd_kernel(sel_ref, a_ref, e_ref, g_ref, we_ref, w2_ref, b2_ref,
                     w3_ref, dout_ref,
                     da_ref, de_ref, dgn_ref, dwe_ref, dw2_ref, db2_ref,
                     dw3_ref, db3_ref, *, has_oh):
    TL, K, H = e_ref.shape[1], e_ref.shape[2], e_ref.shape[3]
    L = g_ref.shape[1]
    oh = _selection(sel_ref, L, e_ref.dtype, has_oh)
    pre, x2, h2 = _chain_fwd(a_ref, e_ref, oh, g_ref, we_ref, w2_ref, b2_ref)
    e = e_ref[0].reshape(TL * K, H)
    dmsg = dout_ref[0].reshape(TL * K, H).astype(jnp.float32)
    _edge_bwd_core(pre, x2, h2, e, oh, we_ref, w2_ref, w3_ref, dmsg,
                   da_ref, de_ref, dgn_ref, dwe_ref, dw2_ref,
                   db2_ref, dw3_ref, db3_ref, TL, K, H)


def _edge_lnmod_bwd_kernel(sel_ref, a_ref, e_ref, g_ref, we_ref, w2_ref,
                           b2_ref, w3_ref, b3_ref, sc_ref, gate_ref, *rest,
                           has_oh, has_keep=False, drop_p=0.0):
    seed_ref = None
    if has_keep or drop_p > 0.0:
        (keep_ref, dout_ref, da_ref, de_ref, dgn_ref, dwe_ref, dw2_ref,
         db2_ref, dw3_ref, db3_ref, dsh_ref, dsc_ref, dgate_ref) = rest
        if drop_p > 0.0:
            seed_ref, keep_ref = keep_ref, None
    else:
        (dout_ref, da_ref, de_ref, dgn_ref, dwe_ref, dw2_ref, db2_ref,
         dw3_ref, db3_ref, dsh_ref, dsc_ref, dgate_ref) = rest
    TL, K, H = e_ref.shape[1], e_ref.shape[2], e_ref.shape[3]
    L = g_ref.shape[1]
    f32 = jnp.float32
    dt = e_ref.dtype
    b_first = pl.program_id(0) == 0
    i_first = pl.program_id(1) == 0

    # recompute forward through the LN (needs msg -> resid -> ln)
    oh = _selection(sel_ref, L, dt, has_oh)
    pre, x2, h2 = _chain_fwd(a_ref, e_ref, oh, g_ref, we_ref, w2_ref, b2_ref)
    x = jnp.dot(h2.astype(dt), w3_ref[...],
                preferred_element_type=f32) + b3_ref[...].astype(f32)
    keep = None
    if has_keep:
        keep = keep_ref[0].reshape(TL * K, H).astype(f32)
        x = x * keep
    elif drop_p > 0.0:
        # regenerate the forward's mask: same per-(sample, tile) seed,
        # same grid/tile size (_pdrop_tile), same generated shape
        keep = _inkernel_keep(seed_ref, drop_p, TL * K, H)
        x = x * keep
    e = e_ref[0].reshape(TL * K, H)
    resid = e.astype(f32) + x
    mean = resid.mean(axis=-1, keepdims=True)
    var = ((resid - mean) ** 2).mean(axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + 1e-6)
    ln = (resid - mean) * r

    sc = sc_ref[0].astype(f32)          # [1, H]
    gate = gate_ref[0].astype(f32)
    dct = dout_ref[0].reshape(TL * K, H).astype(f32)

    # epilogue grads.  out = gate * (ln*(1+sc) + sh):
    #   dsh  = sum_n dct*gate
    #   dsc  = sum_n dct*gate*ln
    #   dgate = sum_n dct*(ln*(1+sc) + sh) — the dct*sh term is added in
    #   the wrapper (sh*sum(dct) is a cheap XLA reduction; sh itself is
    #   not shipped into VMEM since nothing else here needs it)
    dg_out = dct * gate
    _bwd_accumulate(dsh_ref, dg_out.sum(axis=0, keepdims=True)[None],
                    i_first)
    _bwd_accumulate(dsc_ref, (dg_out * ln).sum(axis=0, keepdims=True)[None],
                    i_first)
    dgate_val = dct * (ln * (1.0 + sc))
    dln = dg_out * (1.0 + sc)
    # LayerNorm backward (per edge row over H)
    m1 = dln.mean(axis=-1, keepdims=True)
    m2 = (dln * ln).mean(axis=-1, keepdims=True)
    dresid = r * (dln - m1 - ln * m2)
    # resid = e + keep*msg: the chain sees dresid*keep, e sees dresid
    dmsg = dresid * keep if keep is not None else dresid
    _edge_bwd_core(pre, x2, h2, e, oh, we_ref, w2_ref, w3_ref, dmsg,
                   da_ref, de_ref, dgn_ref, dwe_ref,
                   dw2_ref, db2_ref, dw3_ref, db3_ref, TL, K, H,
                   de_extra=dresid)
    _bwd_accumulate(dgate_ref, dgate_val.sum(axis=0, keepdims=True)[None],
                    i_first)


def _bwd_tile(L, K, H, dt):
    return _tile_rows(L, K, H, bytes_per_edge_elem=26, dt=dt)


def _bwd_weight_outs(H):
    specs = [
        pl.BlockSpec((H, H), lambda b, i: (0, 0)),   # dW_e
        pl.BlockSpec((H, H), lambda b, i: (0, 0)),   # dW2
        pl.BlockSpec((1, H), lambda b, i: (0, 0)),   # db2
        pl.BlockSpec((H, H), lambda b, i: (0, 0)),   # dW3
        pl.BlockSpec((1, H), lambda b, i: (0, 0)),   # db3
    ]
    shapes = [jax.ShapeDtypeStruct((H, H), jnp.float32),
              jax.ShapeDtypeStruct((H, H), jnp.float32),
              jax.ShapeDtypeStruct((1, H), jnp.float32),
              jax.ShapeDtypeStruct((H, H), jnp.float32),
              jax.ShapeDtypeStruct((1, H), jnp.float32)]
    return specs, shapes


def _bwd_data_outs(B, L, K, H, TL, edt):
    """dE comes out in E's own dtype (halves its VMEM + HBM footprint
    under bf16; in f32 tests it stays exact)."""
    specs = [
        pl.BlockSpec((1, TL, H), lambda b, i: (b, i, 0)),      # dA
        pl.BlockSpec((1, TL, K, H), lambda b, i: (b, i, 0, 0)),  # dE
        pl.BlockSpec((1, L, H), lambda b, i: (b, 0, 0)),       # dGn
    ]
    shapes = [jax.ShapeDtypeStruct((B, L, H), jnp.float32),
              jax.ShapeDtypeStruct((B, L, K, H), edt),
              jax.ShapeDtypeStruct((B, L, H), jnp.float32)]
    return specs, shapes


def _pallas_sum_bwd(A, E, Gn, idx, onehot, mask, W_e, W2, b2, W3, dout):
    B, L, K, H = E.shape
    TL = _bwd_tile(L, K, H, E.dtype)
    dt = E.dtype
    sel, sel_spec, has_oh = _sel_operand(idx, onehot, dt, TL)
    d_specs, d_shapes = _bwd_data_outs(B, L, K, H, TL, dt)
    w_specs, w_shapes = _bwd_weight_outs(H)
    return pl.pallas_call(
        functools.partial(_sum_bwd_kernel, has_oh=has_oh),
        grid=(B, L // TL),
        in_specs=([sel_spec] + _common_specs(TL, K, H, Gn.shape[1])
                  + [pl.BlockSpec((1, TL, K), lambda b, i: (b, i, 0))]
                  + _weight_specs(H)[:3]
                  + [pl.BlockSpec((H, H), lambda b, i: (0, 0)),
                     pl.BlockSpec((1, TL, H), lambda b, i: (b, i, 0))]),
        out_specs=d_specs + w_specs,
        out_shape=d_shapes + w_shapes,
        cost_estimate=_chain_cost(B, L, K, H, TL, edge_w3=False),
    )(sel, A.astype(dt), E, Gn.astype(dt), mask.astype(jnp.float32),
      W_e.astype(dt), W2.astype(dt), b2, W3.astype(dt),
      dout.astype(jnp.float32))


def _pallas_edge_bwd(A, E, Gn, idx, onehot, W_e, W2, b2, W3, dout):
    B, L, K, H = E.shape
    TL = _bwd_tile(L, K, H, E.dtype)
    dt = E.dtype
    sel, sel_spec, has_oh = _sel_operand(idx, onehot, dt, TL)
    d_specs, d_shapes = _bwd_data_outs(B, L, K, H, TL, dt)
    w_specs, w_shapes = _bwd_weight_outs(H)
    return pl.pallas_call(
        functools.partial(_edge_bwd_kernel, has_oh=has_oh),
        grid=(B, L // TL),
        in_specs=([sel_spec] + _common_specs(TL, K, H, Gn.shape[1])
                  + _weight_specs(H)[:3]
                  + [pl.BlockSpec((H, H), lambda b, i: (0, 0)),
                     pl.BlockSpec((1, TL, K, H), lambda b, i: (b, i, 0, 0))]),
        out_specs=d_specs + w_specs,
        out_shape=d_shapes + w_shapes,
        cost_estimate=_chain_cost(B, L, K, H, TL),
    )(sel, A.astype(dt), E, Gn.astype(dt),
      W_e.astype(dt), W2.astype(dt), b2, W3.astype(dt), dout)


def _pallas_edge_lnmod_bwd(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3,
                           sc, g, dout, keep=None, seeds=None, drop_p=0.0):
    B, L, K, H = E.shape
    if seeds is not None:
        TL = _pdrop_tile(L, K, H, E.dtype)
    elif keep is not None:
        TL = _tile_rows(L, K, H, bytes_per_edge_elem=28, dt=E.dtype)
    else:
        TL = _bwd_tile(L, K, H, E.dtype)
    dt = E.dtype
    sel, sel_spec, has_oh = _sel_operand(idx, onehot, dt, TL)
    d_specs, d_shapes = _bwd_data_outs(B, L, K, H, TL, dt)
    w_specs, w_shapes = _bwd_weight_outs(H)
    mod_spec = pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0))
    mod_shape = jax.ShapeDtypeStruct((B, 1, H), jnp.float32)
    edge_spec = pl.BlockSpec((1, TL, K, H), lambda b, i: (b, i, 0, 0))
    extra_ops, extra_specs = [], []
    if keep is not None:
        extra_ops = [keep.astype(dt)]
        extra_specs = [edge_spec]
    elif seeds is not None:
        extra_ops = [seeds.astype(jnp.int32)]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    return pl.pallas_call(
        functools.partial(_edge_lnmod_bwd_kernel, has_oh=has_oh,
                          has_keep=keep is not None,
                          drop_p=drop_p if seeds is not None else 0.0),
        grid=(B, L // TL),
        in_specs=([sel_spec] + _common_specs(TL, K, H, Gn.shape[1])
                  + _weight_specs(H)
                  + [mod_spec, mod_spec] + extra_specs + [edge_spec]),
        out_specs=d_specs + w_specs + [mod_spec, mod_spec, mod_spec],
        out_shape=d_shapes + w_shapes + [mod_shape, mod_shape, mod_shape],
        cost_estimate=_chain_cost(B, L, K, H, TL,
                                  epilogue_elems=B * L * K * H),
    )(sel, A.astype(dt), E, Gn.astype(dt),
      W_e.astype(dt), W2.astype(dt), b2, W3.astype(dt), b3,
      sc.astype(dt)[:, None, :], g.astype(dt)[:, None, :],
      *extra_ops, dout)


# ---------------------------------------------------------------------------
# public API with custom vjp


def _cast_like(g, x):
    return None if g is None else g.astype(x.dtype)


@jax.custom_vjp
def fused_message_sum(A, E, Gn, idx, onehot, mask, W_e, W2, b2, W3, b3,
                      scale):
    """Masked, K-summed message chain -> [B, L, H] (f32).

    idx [B, L, K] int32 neighbor indices; onehot [B, L*K, L] (or None) is
    the precomputed selection matrix — fastest when provided (its DMA
    overlaps the MXU); without it the kernels iota-build it in VMEM."""
    if _use_pallas():
        impl = _shard_batched(
            lambda *a: _pallas_message_sum(*a, scale),
            (1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0))
        return impl(A, E, Gn, idx, onehot, mask, W_e, W2, b2, W3, b3)
    return _ref_message_sum(A, E, Gn, idx, mask, W_e, W2, b2, W3, b3, scale)


def _sum_fwd(A, E, Gn, idx, onehot, mask, W_e, W2, b2, W3, b3, scale):
    out = fused_message_sum(A, E, Gn, idx, onehot, mask, W_e, W2, b2, W3,
                            b3, scale)
    return out, (A, E, Gn, idx, onehot, mask, W_e, W2, b2, W3, b3, scale)


def _sum_bwd(res, g):
    A, E, Gn, idx, onehot, mask, W_e, W2, b2, W3, b3, scale = res
    gs = g / scale
    if _use_pallas_bwd():
        impl = _shard_batched(_pallas_sum_bwd,
                              (1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 1),
                              out_psum_flags=(0, 0, 0, 1, 1, 1, 1, 1))
        dA, dE, dGn, dWe, dW2, db2, dW3, db3 = impl(
            A, E, Gn, idx, onehot, mask, W_e, W2, b2, W3, gs)
        return (_cast_like(dA, A), _cast_like(dE, E), _cast_like(dGn, Gn),
                None, None, None, _cast_like(dWe, W_e), _cast_like(dW2, W2),
                _cast_like(db2[0], b2), _cast_like(dW3, W3),
                _cast_like(db3[0], b3), None)
    _, vjp = jax.vjp(
        lambda A, E, Gn, W_e, W2, b2, W3, b3: _ref_message_sum(
            A, E, Gn, idx, mask, W_e, W2, b2, W3, b3, 1.0),
        A, E, Gn, W_e, W2, b2, W3, b3)
    dA, dE, dGn, dWe, dW2, db2, dW3, db3 = vjp(gs)
    return (_cast_like(dA, A), _cast_like(dE, E), _cast_like(dGn, Gn),
            None, None, None, _cast_like(dWe, W_e), _cast_like(dW2, W2),
            _cast_like(db2, b2), _cast_like(dW3, W3),
            _cast_like(db3, b3), None)


fused_message_sum.defvjp(_sum_fwd, _sum_bwd)


@jax.custom_vjp
def fused_message_edge(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3):
    """Unsummed message chain -> [B, L, K, H] (input dtype)."""
    if _use_pallas():
        impl = _shard_batched(_pallas_message_edge,
                              (1, 1, 1, 1, 1, 0, 0, 0, 0, 0))
        return impl(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3)
    return _ref_message(A, E, Gn, idx, W_e, W2, b2, W3, b3).astype(E.dtype)


def _edge_fwd(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3):
    out = fused_message_edge(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3)
    return out, (A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3)


def _edge_bwd(res, g):
    A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3 = res
    if _use_pallas_bwd():
        impl = _shard_batched(_pallas_edge_bwd,
                              (1, 1, 1, 1, 1, 0, 0, 0, 0, 1),
                              out_psum_flags=(0, 0, 0, 1, 1, 1, 1, 1))
        dA, dE, dGn, dWe, dW2, db2, dW3, db3 = impl(
            A, E, Gn, idx, onehot, W_e, W2, b2, W3, g)
        return (_cast_like(dA, A), _cast_like(dE, E), _cast_like(dGn, Gn),
                None, None, _cast_like(dWe, W_e), _cast_like(dW2, W2),
                _cast_like(db2[0], b2), _cast_like(dW3, W3),
                _cast_like(db3[0], b3))
    _, vjp = jax.vjp(
        lambda A, E, Gn, W_e, W2, b2, W3, b3: _ref_message(
            A, E, Gn, idx, W_e, W2, b2, W3, b3).astype(E.dtype),
        A, E, Gn, W_e, W2, b2, W3, b3)
    dA, dE, dGn, dWe, dW2, db2, dW3, db3 = vjp(g)
    return dA, dE, dGn, None, None, dWe, dW2, db2, dW3, db3


fused_message_edge.defvjp(_edge_fwd, _edge_bwd)


@jax.custom_vjp
def fused_message_edge_lnmod(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3,
                             sh, sc, g):
    """Edge chain + residual + LayerNorm + adaLN modulate/gate in one pass
    -> the encoder layer's updated h_E [B, L, K, H]."""
    if _use_pallas():
        impl = _shard_batched(_pallas_message_edge_lnmod,
                              (1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 1, 1, 1))
        return impl(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g)
    return _ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                   sh, sc, g)


def _edge_lnmod_fwd(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g):
    out = fused_message_edge_lnmod(A, E, Gn, idx, onehot, W_e, W2, b2, W3,
                                   b3, sh, sc, g)
    return out, (A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g)


@jax.custom_vjp
def fused_message_edge_lnmod_drop(A, E, Gn, idx, onehot, W_e, W2, b2, W3,
                                  b3, sh, sc, g, keep):
    """The lnmod chain with dropout fused into the epilogue:
    gate * modulate(LN(E + keep * msg), sh, sc).  `keep` [B, L, K, H]
    holds 0 / 1/(1-p) scales — the training path's h_E update runs the
    SAME fused kernel as inference instead of falling back to XLA
    dropout + LN + modulate over three [B, L, K, H] HBM passes."""
    if _use_pallas():
        impl = _shard_batched(
            lambda *a: _pallas_message_edge_lnmod(*a[:13], keep=a[13]),
            (1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 1, 1, 1, 1))
        return impl(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g,
                    keep)
    return _ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                   sh, sc, g, keep=keep)


def _edge_lnmod_drop_fwd(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3,
                         sh, sc, g, keep):
    out = fused_message_edge_lnmod_drop(A, E, Gn, idx, onehot, W_e, W2, b2,
                                        W3, b3, sh, sc, g, keep)
    return out, (A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g, keep)


def _edge_lnmod_drop_bwd(res, ct):
    A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g, keep = res
    if _use_pallas_bwd():
        impl = _shard_batched(
            lambda *a: _pallas_edge_lnmod_bwd(*a[:13], keep=a[13]),
            (1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 1, 1, 1, 1),
            out_psum_flags=(0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0))
        (dA, dE, dGn, dWe, dW2, db2, dW3, db3, dsh, dsc, dg) = impl(
            A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sc, g, ct, keep)
        dct_sum = ct.astype(jnp.float32).sum(axis=(1, 2))
        dg_full = dg[:, 0, :] + dct_sum * sh.astype(jnp.float32)
        return (_cast_like(dA, A), _cast_like(dE, E), _cast_like(dGn, Gn),
                None, None, _cast_like(dWe, W_e), _cast_like(dW2, W2),
                _cast_like(db2[0], b2), _cast_like(dW3, W3),
                _cast_like(db3[0], b3), _cast_like(dsh[:, 0, :], sh),
                _cast_like(dsc[:, 0, :], sc), _cast_like(dg_full, g), None)
    _, vjp = jax.vjp(
        lambda A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g:
        _ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                sh, sc, g, keep=keep),
        A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g)
    dA, dE, dGn, dWe, dW2, db2, dW3, db3, dsh, dsc, dg = vjp(ct)
    return (dA, dE, dGn, None, None, dWe, dW2, db2, dW3, db3, dsh, dsc,
            dg, None)


fused_message_edge_lnmod_drop.defvjp(_edge_lnmod_drop_fwd,
                                     _edge_lnmod_drop_bwd)


def _host_keep(seeds, shape, p, dtype):
    """Non-TPU fallback mask: per-sample threefry keys derived from the
    int32 seeds.  Deterministic given seeds (so this VJP's replay matches
    its own forward), but NOT bit-identical to the TPU hardware PRNG —
    dropout masks are not portable across backends, like every framework."""
    base = jax.random.PRNGKey(0)
    draw = lambda s: jax.random.bernoulli(jax.random.fold_in(base, s),
                                          1.0 - p, shape[1:])
    return jax.vmap(draw)(seeds).astype(dtype) / (1.0 - p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pdrop_impl(p, A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g,
                seeds):
    if _use_pallas():
        impl = _shard_batched(
            lambda *a: _pallas_message_edge_lnmod(*a[:13], seeds=a[13],
                                                  drop_p=p),
            (1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 1, 1, 1, 1))
        return impl(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g,
                    seeds)
    keep = _host_keep(seeds, E.shape, p, E.dtype)
    return _ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                   sh, sc, g, keep=keep)


def _pdrop_fwd(p, A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g,
               seeds):
    out = _pdrop_impl(p, A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3,
                      sh, sc, g, seeds)
    return out, (A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g,
                 seeds)


def _pdrop_bwd(p, res, ct):
    A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g, seeds = res
    if _use_pallas_bwd():
        impl = _shard_batched(
            lambda *a: _pallas_edge_lnmod_bwd(*a[:13], seeds=a[13],
                                              drop_p=p),
            (1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 1, 1, 1, 1),
            out_psum_flags=(0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0))
        (dA, dE, dGn, dWe, dW2, db2, dW3, db3, dsh, dsc, dg) = impl(
            A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sc, g, ct, seeds)
        dct_sum = ct.astype(jnp.float32).sum(axis=(1, 2))
        dg_full = dg[:, 0, :] + dct_sum * sh.astype(jnp.float32)
        return (_cast_like(dA, A), _cast_like(dE, E), _cast_like(dGn, Gn),
                None, None, _cast_like(dWe, W_e), _cast_like(dW2, W2),
                _cast_like(db2[0], b2), _cast_like(dW3, W3),
                _cast_like(db3[0], b3), _cast_like(dsh[:, 0, :], sh),
                _cast_like(dsc[:, 0, :], sc), _cast_like(dg_full, g), None)
    if _use_pallas():
        # CODLAD_PALLAS_BWD=0 A/B hook: the forward's mask came from the
        # hardware PRNG, so the XLA-autodiff replay must use THAT mask
        # (materialized via the debug output), not the threefry fallback
        _, keep = _pallas_message_edge_lnmod(
            A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g,
            seeds=seeds, drop_p=p, debug_mask=True)
    else:
        keep = _host_keep(seeds, E.shape, p, E.dtype)
    _, vjp = jax.vjp(
        lambda A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g:
        _ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                sh, sc, g, keep=keep),
        A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g)
    dA, dE, dGn, dWe, dW2, db2, dW3, db3, dsh, dsc, dg = vjp(ct)
    return (dA, dE, dGn, None, None, dWe, dW2, db2, dW3, db3, dsh, dsc,
            dg, None)


_pdrop_impl.defvjp(_pdrop_fwd, _pdrop_bwd)


def fused_message_edge_lnmod_pdrop(A, E, Gn, idx, onehot, W_e, W2, b2, W3,
                                   b3, sh, sc, g, seeds, p):
    """The lnmod chain with dropout whose mask NEVER exists outside the
    kernel: per-sample int32 `seeds` [B] feed the TPU hardware PRNG
    (pltpu.prng_seed + prng_random_bits), the forward generates keep
    scales in VMEM, and the backward — same grid, same `_pdrop_tile` —
    regenerates the identical bits.  Vs the HBM keep-mask variant this
    removes the [B, L, K, H] mask generation AND its three HBM passes
    (write + fwd read + bwd read).  TPU-bit validation:
    scripts/check_pdrop_tpu.py (interpret mode stubs the PRNG to zeros).

    p is a static Python float (the module's dropout rate).  p == 0 falls
    through to the plain lnmod op (the kernels' seed-operand plumbing is
    keyed on p > 0, and an all-keep mask is pure overhead anyway)."""
    if float(p) <= 0.0:
        return fused_message_edge_lnmod(A, E, Gn, idx, onehot, W_e, W2,
                                        b2, W3, b3, sh, sc, g)
    return _pdrop_impl(float(p), A, E, Gn, idx, onehot, W_e, W2, b2, W3,
                       b3, sh, sc, g, seeds)


def edge_lnmod_pdrop_debug(A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3,
                           sh, sc, g, seeds, p):
    """(out, keep_mask) from the forward kernel — the mask the hardware
    PRNG actually generated, for validation only (TPU backends)."""
    return _pallas_message_edge_lnmod(A, E, Gn, idx, onehot, W_e, W2, b2,
                                      W3, b3, sh, sc, g, seeds=seeds,
                                      drop_p=float(p), debug_mask=True)


def _edge_lnmod_bwd(res, ct):
    A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sh, sc, g = res
    if _use_pallas_bwd():
        impl = _shard_batched(
            _pallas_edge_lnmod_bwd,
            (1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 1, 1, 1),
            out_psum_flags=(0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0))
        (dA, dE, dGn, dWe, dW2, db2, dW3, db3, dsh, dsc, dg) = impl(
            A, E, Gn, idx, onehot, W_e, W2, b2, W3, b3, sc, g, ct)
        # dgate from the kernel lacks the dct*sh term (sh is not shipped
        # into VMEM); sum_n dct*sh = sh * sum_n dct — one cheap XLA
        # reduction over the cotangent.
        dct_sum = ct.astype(jnp.float32).sum(axis=(1, 2))
        dg_full = dg[:, 0, :] + dct_sum * sh.astype(jnp.float32)
        return (_cast_like(dA, A), _cast_like(dE, E), _cast_like(dGn, Gn),
                None, None, _cast_like(dWe, W_e), _cast_like(dW2, W2),
                _cast_like(db2[0], b2), _cast_like(dW3, W3),
                _cast_like(db3[0], b3), _cast_like(dsh[:, 0, :], sh),
                _cast_like(dsc[:, 0, :], sc), _cast_like(dg_full, g))
    _, vjp = jax.vjp(
        lambda A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g:
        _ref_message_edge_lnmod(A, E, Gn, idx, W_e, W2, b2, W3, b3,
                                sh, sc, g),
        A, E, Gn, W_e, W2, b2, W3, b3, sh, sc, g)
    dA, dE, dGn, dWe, dW2, db2, dW3, db3, dsh, dsc, dg = vjp(ct)
    return (dA, dE, dGn, None, None, dWe, dW2, db2, dW3, db3, dsh, dsc, dg)


fused_message_edge_lnmod.defvjp(_edge_lnmod_fwd, _edge_lnmod_bwd)
