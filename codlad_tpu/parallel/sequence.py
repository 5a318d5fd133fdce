"""Sequence parallelism: residues sharded across the mesh.

An extension beyond reference parity (the reference pads to a few hundred
residues and shards nothing, SURVEY §5.7): chains too long for one chip's
HBM shard the residue dimension over a mesh axis.  The scaling analysis
that shapes the design:

  * The ONLY O(L²) object in the model is the kNN distance matrix
    (CAProteinFeatures._dist).  Everything else is O(L·K) per-edge work
    (sharded with the rows) or O(L) per-node tables (cheap to replicate).
  * So: the distance/top-k computation is RING-STREAMED — each shard
    holds its own coordinate block and, over n steps of `ppermute`,
    scores its local residues against every remote block while merging a
    running top-k.  Peak memory is O(L_loc²) per step, never O(L²).
  * Per-node tables (coordinates, backbone frames, node states h_V/h_S)
    are all-gathered where a gather source is needed: [B, L, H] at
    H=128 is ~2 MB/sample-row in bf16 — ICI noise next to the [B, L, K, H]
    edge tensors, which stay sharded.

The denoiser consumes this through its `seq=(axis_name, n_shards)` field
(models/denoiser.py): same parameter pytree as the unsharded model, so
checkpoints are interchangeable and sharded-vs-dense equality is testable
(tests/test_seq_shard.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def seq_all_gather(x, axis_name):
    """Gather a per-node table sharded on dim 1 into its full form."""
    return jax.lax.all_gather(x, axis_name, axis=1, tiled=True)


def local_rows(table, axis_name, n_shards):
    """This shard's row block of a full (replicated) per-node table."""
    L_loc = table.shape[1] // n_shards
    start = jax.lax.axis_index(axis_name) * L_loc
    return jax.lax.dynamic_slice_in_dim(table, start, L_loc, axis=1)


def ring_knn(Ca, maskf, k, axis_name, n_shards, eps=1e-6, big=1e9):
    """kNN over sequence-sharded coordinates without the [L, L] matrix.

    Ca [B, L_loc, 3], maskf [B, L_loc] on each shard.  Returns
    (D_neighbors [B, L_loc, k], E_idx [B, L_loc, k]) for the LOCAL rows,
    with E_idx holding GLOBAL residue indices.

    Semantics vs the dense CAProteinFeatures._dist (nn/mpnn.py): valid
    pairs score identical masked distances; invalid pairs get `big`
    instead of the dense path's row-max adjustment, so when a row has
    fewer than k valid neighbors the fill INDICES may differ — both paths
    fill with masked nodes whose messages the attention mask then zeroes.

    Each of the n ring steps moves every block one hop (ppermute) and
    merges the incoming block into the running top-k: wall-clock is
    O(L_loc · L) distances, memory O(L_loc² + L_loc·k).  The loop is
    differentiable (ppermute transposes to the reverse permutation), so
    featurization gradients flow under training.
    """
    B, L_loc, _ = Ca.shape
    dt = Ca.dtype
    big = jnp.asarray(big, dt)
    me = jax.lax.axis_index(axis_name)

    top_d = jnp.full((B, L_loc, k), big, dt)
    top_i = jnp.zeros((B, L_loc, k), jnp.int32)
    blk_xyz, blk_mask, blk_src = Ca, maskf, me
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    for step in range(n_shards):
        d = jnp.sqrt(jnp.sum(
            (Ca[:, :, None, :] - blk_xyz[:, None, :, :]) ** 2, axis=-1)
            + eps).astype(dt)
        valid = maskf[:, :, None] * blk_mask[:, None, :]
        d = d * valid + (1.0 - valid) * big
        gidx = (blk_src * L_loc
                + jnp.arange(L_loc, dtype=jnp.int32))[None, None, :]
        gidx = jnp.broadcast_to(gidx, d.shape)

        cand_d = jnp.concatenate([top_d, d], axis=-1)
        cand_i = jnp.concatenate([top_i, gidx], axis=-1)
        neg, sel = jax.lax.top_k(-cand_d, k)
        top_d = -neg
        top_i = jnp.take_along_axis(cand_i, sel, axis=-1)

        if step < n_shards - 1:
            blk_xyz = jax.lax.ppermute(blk_xyz, axis_name, perm)
            blk_mask = jax.lax.ppermute(blk_mask, axis_name, perm)
            blk_src = jax.lax.ppermute(blk_src, axis_name, perm)
    return top_d, top_i
