"""Geometry core tests: internal coordinates <-> Cartesian round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codlad_tpu.geometry import residues as R
from codlad_tpu.geometry.internal import (
    bond_angle,
    dihedral,
    extract_ic,
    ic_to_xyz14,
    place_atom,
    rotation_matrix,
    wrap_angle,
)


def random_ca_trace(rng, n_res, step=3.8):
    """Non-degenerate random C-alpha walk with realistic spacing."""
    xyz = [np.zeros(3), np.array([step, 0.0, 0.0])]
    direction = np.array([1.0, 0.0, 0.0])
    for _ in range(n_res - 2):
        while True:
            perturb = rng.normal(size=3) * 0.8
            new_dir = direction + perturb
            new_dir /= np.linalg.norm(new_dir)
            cos = np.dot(new_dir, direction)
            if -0.5 < cos < 0.94:  # avoid collinear and sharp turns
                break
        direction = new_dir
        xyz.append(xyz[-1] + step * direction)
    return np.stack(xyz)


def random_ic(rng, n_res):
    """Plausible random internal coordinates [n_res, 13, 3]."""
    dist = rng.uniform(1.2, 1.6, size=(n_res, 13))
    ang = rng.uniform(0.6, np.pi - 0.6, size=(n_res, 13))
    tor = rng.uniform(-np.pi, np.pi, size=(n_res, 13))
    return np.stack([dist, ang, tor], axis=-1).astype(np.float32)


def test_rotation_matrix_is_rotation():
    rng = np.random.default_rng(0)
    axis = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    angle = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(5,)).astype(np.float32))
    Rm = rotation_matrix(axis, angle)
    eye = jnp.einsum("...ij,...kj->...ik", Rm, Rm)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(Rm)), np.ones(5), atol=1e-5)


def test_place_atom_inverts_measurement():
    """place_atom followed by (dist, angle, dihedral) measurement round-trips."""
    rng = np.random.default_rng(1)
    p1 = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    p2 = p1 + jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    p3 = p2 + jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    ic = jnp.stack(
        [
            jnp.asarray(rng.uniform(1.0, 2.0, size=64).astype(np.float32)),
            jnp.asarray(rng.uniform(0.4, np.pi - 0.4, size=64).astype(np.float32)),
            jnp.asarray(rng.uniform(-np.pi, np.pi, size=64).astype(np.float32)),
        ],
        axis=-1,
    )
    new = place_atom(ic, p1, p2, p3)
    d = jnp.linalg.norm(new - p1, axis=-1)
    a = bond_angle(new - p1, p2 - p1)
    t = dihedral(new, p1, p2, p3)
    np.testing.assert_allclose(np.asarray(d), np.asarray(ic[:, 0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(ic[:, 1]), atol=2e-3)
    diff = np.asarray(wrap_angle(t - ic[:, 2]))
    np.testing.assert_allclose(diff, np.zeros(64), atol=2e-3)


def test_dihedral_known_values():
    p0 = jnp.array([[1.0, 1.0, 0.0]])
    p1 = jnp.array([[1.0, 0.0, 0.0]])
    p2 = jnp.array([[0.0, 0.0, 0.0]])
    # p3 in the same plane, trans: torsion = pi
    p3 = jnp.array([[-1.0, -1.0, 0.0]])
    t = dihedral(p0, p1, p2, p3)
    assert abs(abs(float(t[0])) - np.pi) < 1e-5
    # cis: torsion = 0
    p3 = jnp.array([[-1.0, 1.0, 0.0]])
    t = dihedral(p0, p1, p2, p3)
    assert abs(float(t[0])) < 1e-5


@pytest.mark.parametrize("seed", [0, 1])
def test_ic_xyz_roundtrip(seed):
    """ic -> xyz14 -> ic is the identity on valid slots (all 22 restypes)."""
    rng = np.random.default_rng(seed)
    B, L = 2, 30
    res_type = rng.integers(0, R.NUM_RESTYPES, size=(B, L)).astype(np.int32)
    # ensure every residue type appears somewhere across the test
    res_type[0, :22] = np.arange(22)
    cg = np.stack([random_ca_trace(rng, L + 2) for _ in range(B)]).astype(np.float32)
    ic = np.stack([random_ic(rng, L) for _ in range(B)]).astype(np.float32)

    xyz14 = ic_to_xyz14(jnp.asarray(cg), jnp.asarray(ic), jnp.asarray(res_type))
    ic_back = extract_ic(xyz14, jnp.asarray(cg), jnp.asarray(res_type), wrap=False)

    mask = R.IC_MASK[res_type]  # [B, L, 13]
    ic_b = np.asarray(ic_back)
    # distances
    np.testing.assert_allclose(ic_b[..., 0][mask], ic[..., 0][mask], atol=5e-3)
    # angles
    np.testing.assert_allclose(ic_b[..., 1][mask], ic[..., 1][mask], atol=5e-3)
    # torsions modulo 2 pi
    dt = np.asarray(wrap_angle(jnp.asarray(ic_b[..., 2] - ic[..., 2])))
    np.testing.assert_allclose(dt[mask], np.zeros(mask.sum()), atol=5e-3)


@pytest.mark.slow
def test_ic_to_xyz14_jits_and_ca_passthrough():
    rng = np.random.default_rng(3)
    B, L = 1, 16
    res_type = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
    cg = jnp.asarray(np.stack([random_ca_trace(rng, L + 2)]).astype(np.float32))
    ic = jnp.asarray(np.stack([random_ic(rng, L)]).astype(np.float32))
    f = jax.jit(ic_to_xyz14)
    xyz14 = f(cg, ic, res_type)
    # CA slot is the input trace
    np.testing.assert_allclose(np.asarray(xyz14[:, :, 3]), np.asarray(cg[:, 1:-1]), atol=1e-6)


def test_residue_tables_consistent():
    assert R.ATOM14_EXISTS.shape == (22, 14)
    assert (R.RES_NATOMS >= 4).all() and (R.RES_NATOMS <= 14).all()
    # GLY has no side chain
    gly = R.restype_index("GLY")
    assert R.RES_NATOMS[gly] == 4
    assert not R.ATOM14_EXISTS[gly, 4:].any()
    # ic mask counts = natoms - 1
    np.testing.assert_array_equal(R.IC_MASK.sum(-1), R.RES_NATOMS - 1)
    # every parent triplet of an existing slot points at already-built slots
    for r in range(22):
        for k in range(R.RES_NATOMS[r] - 4):
            assert (R.SC_PARENTS[r, k] < 4 + k).all(), (r, k)
