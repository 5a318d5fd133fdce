"""Device mesh + data-parallel sharding helpers.

The reference's only distribution strategy is DDP data parallelism through
HF Accelerate / NCCL (reference: train_latent.py:41-54,151-153,251).  The
TPU-native equivalent: a 1-D `Mesh` over all chips, batches sharded on the
'data' axis, parameters replicated; `jit` with these shardings makes XLA
insert the gradient psums over ICI automatically.  Multi-host extension
hooks (`jax.distributed`) live here too.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed():
    """Initialize jax.distributed for multi-host runs when the standard
    coordinator env vars are present (no-op single-host).  Call before any
    device access in multi-host launches; per-host data loading then keys
    off jax.process_index() (the TPU equivalent of the reference's
    per-process batch split, train_latent.py:54).

    Explicit JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    env vars are honored directly (works for any launcher, incl. the
    2-process CPU test, tests/test_multihost.py); on TPU pods with
    auto-detected topology, plain COORDINATOR_ADDRESS triggers the no-arg
    auto path."""
    import os

    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if addr:
        kwargs = {}
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            kwargs["coordinator_address"] = addr
            if os.environ.get("JAX_NUM_PROCESSES"):
                kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
            if os.environ.get("JAX_PROCESS_ID"):
                kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        try:
            jax.distributed.initialize(**kwargs)
        except Exception:
            # already initialized, or a coordinator env var that does not
            # belong to a jax launch — proceed single-host either way
            pass
    return jax.process_index(), jax.process_count()


def is_main_process():
    return jax.process_index() == 0


def make_mesh(n_devices=None, axis="data"):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh, axis="data"):
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis="data"):
    """Place a host batch dict with its leading dim sharded over the mesh.

    Multi-host: each process passes its LOCAL rows (per-host data loading)
    and the result is the concatenated global array."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(tree, mesh):
    return jax.device_put(tree, replicated(mesh))


def pad_batch_to_devices(batch, n_devices):
    """Pad the batch dim to a multiple of the mesh size (padded samples get
    all-False masks so they contribute nothing)."""
    B = next(iter(batch.values())).shape[0]
    rem = (-B) % n_devices
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        pad = [(0, rem)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad)
    return out


def make_mesh_2d(n_devices, rows=None, axes=("data", "seq")):
    """2-D mesh for composed parallelism (data x sequence/model).

    The reference has only DDP; this is the TPU-native extension point:
    shard batch on axes[0] and sequence/feature dims on axes[1], and let
    GSPMD insert the collectives (all-gathers around the kNN distance
    matrix, psums for gradients)."""
    devices = jax.devices()[:n_devices]
    if rows is None:
        rows = 1
        while rows * rows <= n_devices:
            rows *= 2
        rows //= 2
        while n_devices % rows:
            rows //= 2
    return Mesh(np.array(devices).reshape(rows, n_devices // rows), axes)


def shard_batch_2d(batch, mesh, seq_keys=(), axes=("data", "seq")):
    """Shard leading dim on axes[0]; for keys in seq_keys also shard their
    second (sequence) dim on axes[1]."""
    out = {}
    for k, v in batch.items():
        if k in seq_keys and v.ndim >= 2:
            spec = P(axes[0], axes[1])
        else:
            spec = P(axes[0])
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
