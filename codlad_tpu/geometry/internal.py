"""Internal-coordinate geometry: extraction and NeRF-style reconstruction.

All functions are pure JAX, operate on the padded ``[B, L, ...]`` atom14
layout, and are shape-static so they compile once per length bucket.  The
reconstruction (`ic_to_xyz14`) replaces the reference's sequential Python
loop (reference: utils/utils_ic.py:242-268 `ic_to_xyz`) with a
``lax.fori_loop`` over the 10 Z-matrix levels — each level places one atom
slot for *every* residue of *every* chain in the batch at once, so the work
per level is a fully vectorized gather + batched 3x3 rotation, which XLA
fuses into a handful of VPU kernels.

Internal-coordinate convention per residue (13 rows of (dist, angle,
torsion), matching reference utils/utils_ic.py:137-194):

  row 0: N  — dist to CA_i, angle w.r.t. CA_{i-1}, torsion over CA_{i+1}
  row 1: C  — dist to CA_i, angle w.r.t. CA_{i+1}, torsion over CA_{i-1}
  row 2: O  — dist to C,   angle w.r.t. CA_i,     torsion over N
  rows 3..12: side-chain atom k placed from its Z-matrix parent triplet
      (a, b, c): dist to atom c, angle w.r.t. (c, b), torsion over (c, b, a).

Distances in Å, angles/torsions in radians.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from codlad_tpu.geometry import residues as R

EPS = 1e-8
TWO_PI = 2.0 * np.pi


def unit(v, eps=EPS):
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 0.0)


def bond_angle(v1, v2):
    """Angle between vectors along the last axis, in [0, pi]."""
    cos = jnp.sum(unit(v1) * unit(v2), axis=-1)
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def dihedral(p0, p1, p2, p3):
    """Torsion angle over p1->p2 (Praxeolitic formulation), in (-pi, pi]."""
    b0 = p0 - p1
    b1 = unit(p2 - p1)
    b2 = p3 - p2
    v = b0 - jnp.sum(b0 * b1, axis=-1, keepdims=True) * b1
    w = b2 - jnp.sum(b2 * b1, axis=-1, keepdims=True) * b1
    x = jnp.sum(v * w, axis=-1)
    y = jnp.sum(jnp.cross(b1, v) * w, axis=-1)
    return jnp.arctan2(y, x)


def wrap_angle(theta):
    """Wrap to (-pi, pi]."""
    return (theta + np.pi) % TWO_PI - np.pi


def rotation_matrix(axis, angle):
    """Euler-Rodrigues rotation matrices.

    axis: [..., 3] (unnormalized), angle: [...]. Returns [..., 3, 3].
    Matches reference utils/utils_ic.py:197-210 (note the -sin convention).
    Degenerate (near-zero) axes — padded residues, collinear parents — fall
    back to x̂ via a double-where so neither the value nor the gradient can
    produce NaNs (0 * NaN poisoning through masked branches).
    """
    n2 = jnp.sum(axis * axis, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(axis).at[..., 0].set(1.0)
    axis = jnp.where(n2 > 1e-16, axis, fallback)
    axis = axis / jnp.sqrt(jnp.sum(axis * axis, axis=-1, keepdims=True))
    a = jnp.cos(angle / 2.0)
    res = -axis * jnp.sin(angle / 2.0)[..., None]
    b, c, d = res[..., 0], res[..., 1], res[..., 2]
    rx = jnp.stack([a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)], axis=-1)
    ry = jnp.stack([2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)], axis=-1)
    rz = jnp.stack([2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c], axis=-1)
    return jnp.stack([rx, ry, rz], axis=-2)


def place_atom(ic, atom1, atom2, atom3):
    """Place an atom from (dist, angle, torsion) relative to three parents.

    ic: [..., 3]; atom1/2/3: [..., 3].  The atom is placed at |dist| from
    atom1, rotated by `angle` about the normal of the (atom1, atom2, atom3)
    plane, then by `torsion` about the atom1->atom2 axis (reference:
    utils/utils_ic.py:213-239 `add_atom_to_xyz`).
    """
    dist, ang, tor = ic[..., 0], ic[..., 1], ic[..., 2]
    a = atom2 - atom1
    b = atom2 - atom3
    a = jnp.where(a == 0.0, a + EPS, a)
    b = jnp.where(b == 0.0, b + EPS, b)

    d = jnp.abs(dist)[..., None] * a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    normal = jnp.cross(a, b)
    # 3x3 rotations are tiny; keep them in full f32 even on the MXU.
    hi = jax.lax.Precision.HIGHEST
    d = jnp.einsum("...ij,...j->...i", rotation_matrix(normal, ang), d, precision=hi)
    d = jnp.einsum("...ij,...j->...i", rotation_matrix(a, tor), d, precision=hi)
    return atom1 + d


def ic_to_xyz14(cg_xyz_full, ic, res_type):
    """Rebuild all-atom coordinates from internal coordinates.

    Args:
      cg_xyz_full: [B, L+2, 3] full (untrimmed) C-alpha trace in Å — the two
        terminal residues only serve as reference frames.
      ic: [B, L, 13, 3] internal coordinates for the L modeled residues.
      res_type: [B, L] int residue-type ids (drive the Z-matrix parents).

    Returns:
      xyz14: [B, L, 14, 3] atom positions in slot order O,N,C,CA,side-chain.
        Slots that don't exist for a residue type contain garbage; mask with
        `residues.ATOM14_EXISTS[res_type]` downstream.
    """
    ca_prev = cg_xyz_full[:, :-2]
    ca_here = cg_xyz_full[:, 1:-1]
    ca_next = cg_xyz_full[:, 2:]

    n = place_atom(ic[:, :, 0], ca_here, ca_prev, ca_next)
    c = place_atom(ic[:, :, 1], ca_here, ca_next, ca_prev)
    o = place_atom(ic[:, :, 2], c, ca_here, n)

    B, L = res_type.shape
    xyz14 = jnp.zeros((B, L, R.MAX_ATOMS, 3), dtype=cg_xyz_full.dtype)
    xyz14 = xyz14.at[:, :, 0].set(o)
    xyz14 = xyz14.at[:, :, 1].set(n)
    xyz14 = xyz14.at[:, :, 2].set(c)
    xyz14 = xyz14.at[:, :, 3].set(ca_here)

    # [B, L, 10, 3] parent slot triplets (a, b, c) per side-chain level.
    parents = jnp.asarray(R.SC_PARENTS)[res_type]

    def body(k, xyz14):
        trip = parents[:, :, k]  # [B, L, 3] = (a, b, c)
        # Placement references: atom1 = slot c, atom2 = slot b, atom3 = slot a
        # (the reference reads the triplet right-to-left,
        # utils/utils_ic.py:253-262).
        def take(slot):
            return jnp.take_along_axis(xyz14, slot[..., None, None].astype(jnp.int32), axis=2)[:, :, 0]

        atom1 = take(trip[..., 2])
        atom2 = take(trip[..., 1])
        atom3 = take(trip[..., 0])
        new_atom = place_atom(ic[:, :, 3 + k], atom1, atom2, atom3)
        return jax.lax.dynamic_update_index_in_dim(
            xyz14, new_atom[:, :, None], R.NUM_BB + k, axis=2
        ).reshape(xyz14.shape)

    # The 10 levels are sequentially dependent (an atom's parents may have
    # been placed at an earlier level) — but each level is dense over B*L.
    for k in range(R.MAX_SC):
        xyz14 = body(k, xyz14)
    return xyz14


def extract_ic(xyz14, cg_xyz_full, res_type, wrap=True):
    """Inverse of `ic_to_xyz14`: internal coordinates from atom positions.

    Replaces the reference's mdtraj-based extraction
    (utils/utils_ic.py:137-194) with pure JAX so it can run in-loop on TPU.
    Returns ic [B, L, 13, 3]; rows for non-existent side-chain slots are
    meaningless (mask with `residues.IC_MASK[res_type]`).  When `wrap` is
    True, angles/torsions are reduced mod 2*pi into [0, 2*pi) to match the
    dataset convention (reference utils/protein_module.py:777).
    """
    ca_prev = cg_xyz_full[:, :-2]
    ca_here = cg_xyz_full[:, 1:-1]
    ca_next = cg_xyz_full[:, 2:]
    o, n, c = xyz14[:, :, 0], xyz14[:, :, 1], xyz14[:, :, 2]

    n_ic = jnp.stack([
        jnp.linalg.norm(n - ca_here, axis=-1),
        bond_angle(n - ca_here, ca_prev - ca_here),
        dihedral(n, ca_here, ca_prev, ca_next),
    ], axis=-1)
    c_ic = jnp.stack([
        jnp.linalg.norm(c - ca_here, axis=-1),
        bond_angle(c - ca_here, ca_next - ca_here),
        dihedral(c, ca_here, ca_next, ca_prev),
    ], axis=-1)
    o_ic = jnp.stack([
        jnp.linalg.norm(o - c, axis=-1),
        bond_angle(o - c, ca_here - c),
        dihedral(o, c, ca_here, n),
    ], axis=-1)

    parents = jnp.asarray(R.SC_PARENTS)[res_type]  # [B, L, 10, 3]

    def take(slot):
        return jnp.take_along_axis(xyz14, slot[..., None].astype(jnp.int32), axis=2)

    a4 = take(parents[..., 0])  # [B, L, 10, 3]
    a3 = take(parents[..., 1])
    a2 = take(parents[..., 2])
    a1 = xyz14[:, :, R.NUM_BB:]

    sc_ic = jnp.stack([
        jnp.linalg.norm(a1 - a2, axis=-1),
        bond_angle(a1 - a2, a3 - a2),
        wrap_angle(dihedral(a1, a2, a3, a4)),
    ], axis=-1)

    ic = jnp.concatenate([jnp.stack([n_ic, c_ic, o_ic], axis=2), sc_ic], axis=2)
    if wrap:
        ic = ic.at[..., 1:].set(ic[..., 1:] % TWO_PI)
    return ic
