"""Pallas edge gather/aggregate kernels for the Stage-1 graph convolutions.

The XLA one-hot formulation (nn/graph.DenseEdgeOps) materializes the
[B, E, N] selection matrices in HBM and re-reads them for every gather /
aggregate: at PED scale (E~66k directed edges, N=1792 atoms) the Stage-1
encoder forward moves ~35 GB of HBM per step — memory-bound at ~44 ms
roofline while the actual contraction is 276 GFLOP (1.4 ms).  These
kernels build the one-hot ON THE FLY per edge tile inside VMEM (an
iota-compare over the int32 indices — zero HBM footprint) and keep the
per-sample node table resident in VMEM across edge tiles, so HBM traffic
drops to the irreducible: indices once, node table once, messages once.

Gather and aggregate are each other's transpose, which makes the custom
VJPs exact:  d(gather)/d(nodes)^T g = aggregate_sum(g)  and
d(aggregate_sum)/d(msgs)^T g = gather(g).

Interpret mode runs the same kernels on CPU for tests; non-TPU backends
fall back to the pure-JAX twins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from codlad_tpu.kernels.meshing import shard_batched

try:  # pltpu only exists with TPU support compiled in
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_TILE_E = 1024


def _use_pallas():
    try:
        return jax.default_backend() in ("tpu", "axon") and pltpu is not None
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# kernels



def _split_dot(onehot_bf16, x, transpose_onehot=False):
    """f32-accurate matmul against a 0/1 bf16 one-hot.

    bf16 payloads are EXACT in one DEFAULT-precision MXU pass (the one-hot
    rows select single elements; f32 accumulation adds them exactly).  f32
    payloads get a hi/lo bf16 split — two passes, ≈1e-5 rel — instead of
    the 6-pass HIGHEST f32 path (which dominated the kernel cost).
    """
    oh = onehot_bf16.T if transpose_onehot else onehot_bf16
    if x.dtype == jnp.bfloat16:
        return jnp.dot(oh, x, preferred_element_type=jnp.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
    out += jnp.dot(oh, lo, preferred_element_type=jnp.float32)
    return out


def _gather_kernel(idx_ref, mask_ref, nodes_ref, out_ref):
    """out[e, :] = mask[e] * nodes[idx[e], :] for one (sample, edge-tile).

    idx_ref: [1, TE, 1] int32; mask_ref: [1, TE, 1] f32; nodes_ref:
    [1, N, F]; out_ref: [1, TE, F].  The one-hot lives only in VMEM.
    """
    n = nodes_ref.shape[1]
    idx = idx_ref[0, :, :]          # [TE, 1]
    onehot = (idx == jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1))
    out = _split_dot(onehot.astype(jnp.bfloat16), nodes_ref[0])
    # mask the narrow [TE, F] output, not the [TE, N] one-hot (50x less VPU)
    out_ref[0] = (out * mask_ref[0, :, :]).astype(out_ref.dtype)


def _aggregate_kernel(idx_ref, mask_ref, msgs_ref, out_ref, acc_ref):
    """out[n, :] = sum_e mask[e] * msgs[e, :] [idx[e] == n], accumulated
    across the edge-tile grid dimension (TPU grids run sequentially).

    idx_ref: [1, TE, 1] int32; mask_ref: [1, TE, 1] f32; msgs_ref:
    [1, TE, F]; out_ref: [1, N, F]; acc_ref: VMEM [N, F] f32 scratch.
    """
    e = pl.program_id(1)
    n = out_ref.shape[1]
    idx = idx_ref[0, :, :]          # [TE, 1]
    onehot = (idx == jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1))
    msgs = msgs_ref[0] * mask_ref[0, :, :].astype(msgs_ref.dtype)
    contrib = _split_dot(onehot.astype(jnp.bfloat16), msgs,
                         transpose_onehot=True)

    @pl.when(e == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += contrib

    @pl.when(e == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _pad_edges(idx, maskf, tile):
    E = idx.shape[1]
    pad = (-E) % tile
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        maskf = jnp.pad(maskf, ((0, 0), (0, pad)))
    return idx, maskf, E + pad


def _pallas_gather(idx, maskf, nodes, interpret=False):
    """idx [B, E] int32, maskf [B, E] f32, nodes [B, N, F] -> [B, E, F]."""
    B, E = idx.shape
    _, N, F = nodes.shape
    idx_p, mask_p, EP = _pad_edges(idx, maskf, _TILE_E)
    grid = (B, EP // _TILE_E)
    out = pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TILE_E, 1), lambda b, e: (b, e, 0)),
            pl.BlockSpec((1, _TILE_E, 1), lambda b, e: (b, e, 0)),
            pl.BlockSpec((1, N, F), lambda b, e: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _TILE_E, F), lambda b, e: (b, e, 0)),
        out_shape=jax.ShapeDtypeStruct((B, EP, F), nodes.dtype),
        interpret=interpret,
    )(idx_p[..., None], mask_p[..., None], nodes)
    return out[:, :E]


def _pallas_aggregate(idx, maskf, msgs, n_nodes, interpret=False):
    """idx [B, E] int32, maskf [B, E] f32, msgs [B, E, F] -> [B, N, F]."""
    B, E, F = msgs.shape
    idx_p, mask_p, EP = _pad_edges(idx, maskf, _TILE_E)
    pad = EP - E
    if pad:
        msgs = jnp.pad(msgs, ((0, 0), (0, pad), (0, 0)))
    grid = (B, EP // _TILE_E)
    return pl.pallas_call(
        _aggregate_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TILE_E, 1), lambda b, e: (b, e, 0)),
            pl.BlockSpec((1, _TILE_E, 1), lambda b, e: (b, e, 0)),
            pl.BlockSpec((1, _TILE_E, F), lambda b, e: (b, e, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_nodes, F), lambda b, e: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_nodes, F), msgs.dtype),
        scratch_shapes=[pltpu.VMEM((n_nodes, F), jnp.float32)],
        interpret=interpret,
    )(idx_p[..., None], mask_p[..., None], msgs)


# ---------------------------------------------------------------------------
# pure-JAX twins (ground truth + non-TPU fallback)


def _ref_gather(idx, maskf, nodes):
    out = jnp.take_along_axis(nodes, idx[..., None], axis=1)
    return out * maskf[..., None].astype(out.dtype)


def _ref_aggregate(idx, maskf, msgs, n_nodes):
    B, E, F = msgs.shape
    dt = msgs.dtype
    msgs = msgs.astype(jnp.float32) * maskf[..., None]
    offs = (jnp.arange(B) * n_nodes)[:, None]
    seg = (idx + offs).reshape(-1)
    out = jax.ops.segment_sum(msgs.reshape(B * E, F), seg,
                              num_segments=B * n_nodes)
    # accumulate in f32, emit in the payload dtype so the backward
    # cotangent rides the single-pass bf16 gather path
    return out.reshape(B, n_nodes, F).astype(dt)


# ---------------------------------------------------------------------------
# differentiable entry points (gather/aggregate are mutual transposes)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def edge_gather(idx, maskf, nodes):
    """nodes [B, N, F] -> per-edge rows [B, E, F] (0 where masked)."""
    if _use_pallas():
        return shard_batched(_pallas_gather, (1, 1, 1))(idx, maskf, nodes)
    return _ref_gather(idx, maskf, nodes)


def _gather_fwd(idx, maskf, nodes):
    # zero-size proto carries the primal dtype (raw dtypes aren't pytree
    # leaves); cotangent dtype must match the primal's (bf16 feature paths)
    proto = jnp.zeros((0,), nodes.dtype)
    return edge_gather(idx, maskf, nodes), (idx, maskf, nodes.shape[1], proto)


def _gather_bwd(res, g):
    idx, maskf, n_nodes, proto = res
    return None, None, edge_aggregate(idx, maskf, g, n_nodes).astype(proto.dtype)


edge_gather.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def edge_aggregate(idx, maskf, msgs, n_nodes):
    """msgs [B, E, F] -> summed per-node [B, N, F] (masked edges drop)."""
    if _use_pallas():
        return shard_batched(
            lambda i, m, x: _pallas_aggregate(i, m, x, n_nodes),
            (1, 1, 1))(idx, maskf, msgs)
    return _ref_aggregate(idx, maskf, msgs, n_nodes)


def _aggregate_fwd(idx, maskf, msgs, n_nodes):
    proto = jnp.zeros((0,), msgs.dtype)
    return edge_aggregate(idx, maskf, msgs, n_nodes), (idx, maskf, proto)


def _aggregate_bwd(n_nodes, res, g):
    idx, maskf, proto = res
    return None, None, edge_gather(idx, maskf, g).astype(proto.dtype)


edge_aggregate.defvjp(_aggregate_fwd, _aggregate_bwd)
