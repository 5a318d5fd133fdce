"""Evaluation metrics: RMSD/DIV, GED, clash ratio, interaction scores,
covalent-graph validity.

JAX ports of the reference harness metrics (reference: test.py:37-188 and
utils/protein_module.py:251-364), operating on padded [.., L, 14, 3] frames
with masks.  Alignment RMSD uses a Kabsch superposition (the reference
relies on mdtraj's aligned rmsd for the DIV metric).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from codlad_tpu.geometry import residues as R

EPS = 1e-7


def _masked_center(x, m):
    w = m[..., None]
    return (x * w).sum(-2) / jnp.maximum(w.sum(-2), 1.0)


def kabsch_rmsd(x, y, mask):
    """Aligned RMSD between point sets x, y: [..., N, 3] with mask [..., N]."""
    mf = mask.astype(x.dtype)
    xc = x - _masked_center(x, mf)[..., None, :]
    yc = y - _masked_center(y, mf)[..., None, :]
    xc = xc * mf[..., None]
    yc = yc * mf[..., None]
    # C = sum_n x_n y_n^T ; optimal R (mapping y -> x) = U diag(1,1,d) V^T
    C = jnp.einsum("...ni,...nj->...ij", xc, yc)
    U, S, Vt = jnp.linalg.svd(C)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.concatenate([
        jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None],
        det[..., None]], axis=-1)
    Rm = jnp.einsum("...ij,...j,...jk->...ik", U, D, Vt)
    y_rot = jnp.einsum("...ij,...nj->...ni", Rm, yc)
    n = jnp.maximum(mf.sum(-1), 1.0)
    return jnp.sqrt((((y_rot - xc) ** 2).sum(-1) * mf).sum(-1) / n)


def unaligned_rmsd(x, y, mask):
    """Per-frame sqrt(mean |x - y|^2) over masked atoms (the reference's
    headline all-atom RMSD, test.py:649-650)."""
    mf = mask.astype(x.dtype)
    n = jnp.maximum(mf.sum(-1), 1.0)
    return jnp.sqrt((((x - y) ** 2).sum(-1) * mf).sum(-1) / n)


def _flat(xyz14):
    B = xyz14.shape[0]
    return xyz14.reshape(B, -1, 3)


def _edge_dist(flat, edges, mask):
    p0 = jnp.take_along_axis(flat, edges[..., 0:1], axis=1)
    p1 = jnp.take_along_axis(flat, edges[..., 1:2], axis=1)
    d = jnp.sqrt(((p0 - p1) ** 2).sum(-1) + EPS)
    return d, mask.astype(d.dtype)


def ged_score(xyz14_gen, xyz14_ref, bond_edges, bond_mask):
    """Mean squared bonded-distance error (reference test.py:141-146)."""
    g, m = _edge_dist(_flat(xyz14_gen), bond_edges, bond_mask)
    r, _ = _edge_dist(_flat(xyz14_ref), bond_edges, bond_mask)
    return ((g - r) ** 2 * m).sum() / jnp.maximum(m.sum(), 1.0)


def clash_ratio(xyz14_gen, clash_edges, clash_mask, bb_no_edges, bb_no_mask,
                cutoff=1.2):
    """Fraction of non-bonded pairs closer than cutoff, plus the backbone
    N-O fraction (reference test.py:118-139)."""
    d, m = _edge_dist(_flat(xyz14_gen), clash_edges, clash_mask)
    nbr = ((d < cutoff) * m).sum() / jnp.maximum(m.sum(), 1.0)
    d2, m2 = _edge_dist(_flat(xyz14_gen), bb_no_edges, bb_no_mask)
    bb = ((d2 < cutoff) * m2).sum() / jnp.maximum(m2.sum(), 1.0)
    return nbr + bb


def interaction_scores(xyz14_gen, inter_edges, inter_mask, pipi_pairs,
                       pipi_mask):
    """Weighted interaction + pi-pi hinge scores (reference test.py:97-116)."""
    flat = _flat(xyz14_gen)
    d, m = _edge_dist(flat, inter_edges, inter_mask)
    n_inter = m.sum()
    c0 = 0.5 * (jnp.take_along_axis(flat, pipi_pairs[..., 0:1], 1)
                + jnp.take_along_axis(flat, pipi_pairs[..., 1:2], 1))
    c1 = 0.5 * (jnp.take_along_axis(flat, pipi_pairs[..., 2:3], 1)
                + jnp.take_along_axis(flat, pipi_pairs[..., 3:4], 1))
    pd = jnp.sqrt(((c0 - c1) ** 2).sum(-1) + EPS)
    pm = pipi_mask.astype(pd.dtype)
    n_pipi = pm.sum()
    n_tot = jnp.maximum(n_inter + n_pipi, 1.0)
    inter = (jax.nn.relu(d - 4.0) * m).sum() / jnp.maximum(n_inter, 1.0)
    pipi = (jax.nn.relu(pd - 6.0) * pm).sum() / jnp.maximum(n_pipi, 1.0)
    return inter * n_inter / n_tot + pipi * n_pipi / n_tot, pipi


def graph_validity(xyz14_gen, xyz14_ref, res_type, atom_mask, scale=1.3):
    """Covalent bond-graph match ratio vs the reference structure.

    Bond graphs are thresholded pairwise distances against summed covalent
    cutoffs * scale (reference utils/protein_module.py:279-325; heavy atoms
    only — this framework is all-heavy-atom).  Returns (valid, diff_ratio)
    per frame: valid = 1 if the graphs match exactly, diff_ratio =
    |sum(ref - gen)| / sum(ref).
    """
    B = xyz14_gen.shape[0]
    z = jnp.asarray(R.ATOM14_ATOMIC_NUM)[res_type].reshape(B, -1)
    mask = atom_mask.reshape(B, -1)
    cut = jnp.asarray(
        np.array([R.COVALENT_CUTOFF.get(i, 1.5) for i in range(120)], np.float32))[z]
    N = mask.shape[1]
    xg, xr = _flat(xyz14_gen), _flat(xyz14_ref)

    # Row-chunked scan: peak memory O(B*C*N) instead of the full O(B*N^2)
    # distance matrices (which blow up past ~3k residues).
    C = min(N, 1024)
    pad = (-N) % C
    nchunks = (N + pad) // C

    # row-sliced copies padded so every chunk slices in-bounds; column
    # operands stay at the true N
    if pad:
        padded = lambda a: jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
        mask_r, cut_r, xg_r, xr_r = (padded(mask), padded(cut), padded(xg),
                                     padded(xr))
    else:
        mask_r, cut_r, xg_r, xr_r = mask, cut, xg, xr

    def chunk_stats(carry, i):
        diff, net, nref = carry
        sl = i * C
        rows = lambda a: jax.lax.dynamic_slice_in_dim(a, sl, C, axis=1)
        idx = sl + jnp.arange(C)
        row_ok = rows(mask_r) & (idx < N)[None]
        cutoff = (rows(cut_r)[:, :, None] + cut[:, None, :]) * scale
        pm = (row_ok[:, :, None] & mask[:, None, :]
              & (idx[None, :, None] != jnp.arange(N)[None, None, :]))

        def bonds(xrow, xall):
            d = jnp.sqrt(((xrow[:, :, None] - xall[:, None, :]) ** 2).sum(-1)
                         + EPS)
            return (d < cutoff) & pm

        bg = bonds(rows(xg_r), xg)
        br = bonds(rows(xr_r), xr)
        diff += (bg != br).sum((1, 2))
        net += (br.astype(jnp.int32) - bg.astype(jnp.int32)).sum((1, 2))
        nref += br.sum((1, 2))
        return (diff, net, nref), None

    zero = jnp.zeros((B,), jnp.int32)
    (diff, net, nref), _ = jax.lax.scan(chunk_stats, (zero, zero, zero),
                                        jnp.arange(nchunks))
    valid = (diff == 0).astype(jnp.float32)
    # reference ratio: |net signed difference| / ref bond count
    # (protein_module.py:320: (ref - gen).sum().abs() / ref.sum())
    ratio = jnp.abs(net).astype(jnp.float32) / jnp.maximum(nref, 1)
    return valid, ratio


def diversity(gen_ensemble, ref, mask):
    """DIV = 1 - rmsd_gen/rmsd_ref over an ensemble (reference
    test.py:81-95): rmsd_ref = mean aligned RMSD of samples vs the
    reference; rmsd_gen = mean aligned RMSD vs the ensemble mean.

    gen_ensemble: [G, B, N, 3] flat atoms; ref: [B, N, 3]; mask: [B, N].
    """
    G = gen_ensemble.shape[0]
    rmsd_ref = jnp.stack([kabsch_rmsd(ref, gen_ensemble[g], mask) for g in range(G)]).mean()
    mean_gen = gen_ensemble.mean(0)
    rmsd_gen = jnp.stack([kabsch_rmsd(mean_gen, gen_ensemble[g], mask) for g in range(G)]).mean()
    return 1.0 - rmsd_gen / jnp.maximum(rmsd_ref, 1e-8), rmsd_ref, rmsd_gen
