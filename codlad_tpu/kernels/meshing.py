"""Batch-partitioned Pallas execution on device meshes.

GSPMD has no partitioning rule for `pallas_call`: under a jit with
batch-sharded operands it ALL-GATHERS the kernel's inputs and runs the
kernel fully replicated on every chip (verified on the 8-device CPU
mesh: all-gathers in the lowered HLO, replicated output sharding) —
silently destroying data-parallel scaling for exactly the compute the
kernels exist to accelerate.

The fix: trainers register their mesh once via `set_kernel_mesh(mesh)`
and every fused op wraps its Pallas branch in `shard_map` over the batch
axis — kernels run on LOCAL shards, per-shard partial weight gradients
are psum'd over ICI (the one collective DP needs), and batch-dim outputs
stay sharded.  The registration is consulted at TRACE time, so set it
before the jitted step first runs (retraces on new bucket shapes see the
same registration).

Reference: the reference scales via DDP/NCCL (train_latent.py:41-54);
this module is the TPU-native equivalent for the custom-kernel subset of
the model (XLA handles the rest of the graph natively under GSPMD).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import PartitionSpec as P

_KERNEL_MESH = None  # (Mesh, batch axis name) | None


def set_kernel_mesh(mesh, axis="data"):
    """Register (or clear, with None) the mesh for batch-partitioned
    kernel execution.  Call once at trainer startup, BEFORE the jitted
    step first traces; single-chip and non-TPU runs need not call it."""
    global _KERNEL_MESH
    _KERNEL_MESH = None if mesh is None else (mesh, axis)


def get_kernel_mesh():
    return _KERNEL_MESH


def shard_batched(impl, batch_flags, out_psum_flags=None):
    """Wrap a pallas wrapper `impl` in shard_map over the registered mesh.

    batch_flags[i]: operand i is batch-leading (sharded on the data axis);
    otherwise replicated (weights, static tables).  out_psum_flags:
    None -> every output batch-leading; else a tuple where True marks
    per-shard PARTIAL sums (weight grads) that are psum'd over the axis
    and returned replicated.  Literal-None operands (optional selection
    matrices) are pinned through the closure.
    """
    if _KERNEL_MESH is None:
        return impl
    mesh, axis = _KERNEL_MESH
    shard_map = functools.partial(jax.shard_map, check_vma=False)

    in_specs = tuple(P(axis) if f else P() for f in batch_flags)
    if out_psum_flags is None:
        out_specs = P(axis)
    else:
        out_specs = tuple(P() if f else P(axis) for f in out_psum_flags)

    def body(*args):
        out = impl(*args)
        if out_psum_flags is None:
            return out
        return tuple(jax.lax.psum(o, axis) if f else o
                     for o, f in zip(out, out_psum_flags))

    def wrapped(*args):
        live = [i for i, a in enumerate(args) if a is not None]
        specs = tuple(in_specs[i] for i in live)

        def live_body(*live_args):
            full = list(args)
            for i, a in zip(live, live_args):
                full[i] = a
            return body(*full)

        return shard_map(live_body, mesh=mesh, in_specs=specs,
                         out_specs=out_specs)(
            *(args[i] for i in live))

    return wrapped
