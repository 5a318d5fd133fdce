"""Experiment: can tpu.dynamic_gather beat the one-hot selection matmul?

The fused message chains gather neighbor tables G[idx] (idx in [0, L),
TE = TL*K rows) as a [TE, L] one-hot @ [L, H] MXU matmul — 2*TE*L*H
"bookkeeping" FLOPs per chain (~230 GFLOP/step at the bench shape).
Mosaic lowers jnp.take_along_axis(table, idx2d, axis=0) to
tpu.dynamic_gather (VPU, zero MXU FLOPs).  This script times three
kernel variants of gather + a payload matmul epilogue at the bench
tile shape, chained through dependent inputs so the remote executor
cannot memoize:

  oh   — one-hot HBM operand, selection matmul (current production mode)
  iota — in-VMEM iota-compare one-hot build, selection matmul
  dyn  — chunked dynamic_gather over the sublane dim (TE/L chunks)

Run on a real TPU: python scripts/exp_dyn_gather.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B, L, K, H = 96, 128, 64, 128
TL = 32  # rows per tile (matches _tile_rows at this shape ballpark)
DT = jnp.bfloat16


def _payload(g, w):
    # stand-in for the chain's useful work so the gather overlap is realistic
    return jnp.dot(g.astype(DT), w, preferred_element_type=jnp.float32)


def k_oh(oh_ref, g_ref, w_ref, o_ref):
    oh = oh_ref[0]                                     # [TL*K, L]
    g = jnp.dot(oh, g_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = _payload(g, w_ref[...]).reshape(TL, K, H).astype(o_ref.dtype)


def k_iota(idx_ref, g_ref, w_ref, o_ref):
    idx = idx_ref[0]                                   # [TL, K]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TL, K, L), 2)
    oh = (idx[:, :, None] == iota).astype(DT).reshape(TL * K, L)
    g = jnp.dot(oh, g_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = _payload(g, w_ref[...]).reshape(TL, K, H).astype(o_ref.dtype)


def k_dyn(idx_ref, g_ref, w_ref, o_ref):
    # idx arrives pre-chunked [n_chunks, L]; one transpose puts the row
    # indices on the SUBLANE dim, then each chunk is a static column
    # slice + lane-broadcast feeding tpu.dynamic_gather.
    n_chunks = TL * K // L
    idx_t = jnp.transpose(idx_ref[0], (1, 0))          # [L, n_chunks]
    # tpu.dynamic_gather needs matching index/data bitwidths: gather the
    # table as f32 (int32 indices), cast after
    tab = g_ref[0].astype(jnp.float32)                 # [L, H]
    chunks = []
    for c in range(n_chunks):
        idc = jnp.broadcast_to(idx_t[:, c:c + 1], (L, H))
        chunks.append(jnp.take_along_axis(tab, idc, axis=0))
    g = jnp.concatenate(chunks, axis=0)                # [TE, H]
    o_ref[0] = _payload(g, w_ref[...]).reshape(TL, K, H).astype(o_ref.dtype)


def build(kind):
    grid = (B, L // TL)
    out_shape = jax.ShapeDtypeStruct((B, L // TL * TL, K, H), DT)
    g_spec = pl.BlockSpec((1, L, H), lambda b, t: (b, 0, 0))
    w_spec = pl.BlockSpec((H, H), lambda b, t: (0, 0))
    o_spec = pl.BlockSpec((1, TL, K, H), lambda b, t: (b, t, 0, 0))
    if kind == "oh":
        sel_spec = pl.BlockSpec((1, TL * K, L), lambda b, t: (b, t, 0))
        kern = k_oh
    elif kind == "dyn":
        # idx pre-chunked host-side: [B, tiles * n_chunks, L]
        sel_spec = pl.BlockSpec((1, TL * K // L, L), lambda b, t: (b, t, 0))
        kern = k_dyn
    else:
        sel_spec = pl.BlockSpec((1, TL, K), lambda b, t: (b, t, 0))
        kern = k_iota
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[sel_spec, g_spec, w_spec],
        out_specs=o_spec, out_shape=out_shape)


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, L, size=(B, L, K)).astype(np.int32))
    oh_np = jax.nn.one_hot(idx.reshape(B, L * K), L, dtype=DT)
    G = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32)).astype(DT)
    W = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32)).astype(DT)

    ref = np.asarray(G.astype(jnp.float32))[
        np.arange(B)[:, None, None], np.asarray(idx)]          # [B, L, K, H]
    ref_out = np.einsum("blkh,hj->blkj", ref.astype(np.float32), np.asarray(W.astype(jnp.float32)))

    for kind in ("oh", "iota", "dyn"):
        try:
            f = jax.jit(build(kind))
            if kind == "oh":
                args0 = (oh_np, G, W)
            elif kind == "dyn":
                # [B, L, K] -> [B, tiles*n_chunks, L]: row-major edge order
                # within each TL-tile is preserved (TL*K = n_chunks * L)
                args0 = (idx.reshape(B, L * K // L, L), G, W)
            else:
                args0 = (idx, G, W)
            out = f(*args0)
            out.block_until_ready()
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32).reshape(B, L, K, H)
                                        - ref_out)))
            # chained timing: feed the (cast) output back as G-perturbation
            g = G
            t0 = time.perf_counter()
            N = 30
            for i in range(N):
                g = (g + 0.0 * out[:, :, 0, :].astype(DT)).astype(DT)
                out = f(args0[0], g, W)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / N * 1e3
            print(f"{kind:5s}: {dt:7.3f} ms/call  max_err={err:.3e}")
        except Exception as e:
            print(f"{kind:5s}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
