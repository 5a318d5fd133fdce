"""e3nn basis conventions, reconstructed from first principles.

The reference's equivariant stack runs on e3nn (reference:
models/gcn_nn.py:181-219 `TensorProductConvLayer` wraps
o3.FullyConnectedTensorProduct + o3.spherical_harmonics).  Importing its
trained weights into this framework's tensor products needs the exact
relation between the two bases.  e3nn is not installable here, but its
conventions are plain public math, reconstructed below and verified by
internal consistency tests (tests/test_convert.py):

  * real spherical harmonics with the Y axis as polar axis and azimuth
    measured from z toward x (e3nn's xyz_to_angles: beta=acos(y),
    alpha=atan2(x, z)), components ordered m=-l..l.  This makes
    Y1 = sqrt(3)*(x, y, z) — identical to ours — and
    Y2 = (√15·xz, √15·xy, √5/2·(3y²−1), √15·yz, √15/2·(z²−x²)),
    a signed permutation + 2x2 mix of our z-polar ordering.
  * Wigner 3j tensors built from SU(2) Clebsch–Gordan coefficients
    (Racah's formula) conjugated into the real basis by e3nn's
    change_basis_real_to_complex (the (-i)^l phase makes them real),
    normalized to unit Frobenius norm.

From these we derive, per tensor-product path (l1, l2, l3):

  * `basis_change(l)`: orthogonal P_l with our_sh = P_l @ e3nn_sh;
  * `path_ratio(l1,l2,l3)`: the ±1 alignment between our numerically
    solved coupling tensor (nn/irreps.coupling_tensor) and e3nn's w3j
    expressed in our basis;
  * `path_weight_multiplier`: ratio × sqrt(2*l3+1), the last factor being
    e3nn's 'component' irrep normalization (ours normalizes by
    1/sqrt(fan) only; both share the same 'element' path fan).

Multiplying the imported per-path weight blocks (the rows of the
weight-generator MLP's final Linear) by this constant makes our
FullyConnectedTP reproduce e3nn's FullyConnectedTensorProduct output
exactly in our basis for l<=1 node features (P_1 = I), which covers every
feature the reference encoder/prior ever feeds to a readout Dense.
"""

from __future__ import annotations

import functools
from fractions import Fraction
from math import factorial

import numpy as np

from codlad_tpu.nn.irreps import Irreps, coupling_tensor, tp_paths, _sh_np


# ---------------------------------------------------------------- SU(2) CG

def _f(n):
    return factorial(round(n))


def su2_cg_coeff(j1, m1, j2, m2, j3, m3):
    """<j1 m1 j2 m2 | j3 m3> by Racah's formula (exact rationals)."""
    if m3 != m1 + m2:
        return 0.0
    vmin = int(max(-j1 + j2 + m3, -j1 + m1, 0))
    vmax = int(min(j2 + j3 + m1, j3 - j1 + j2, j3 + m3))
    C = (2.0 * j3 + 1.0) * float(Fraction(
        _f(j3 + j1 - j2) * _f(j3 - j1 + j2) * _f(j1 + j2 - j3)
        * _f(j3 + m3) * _f(j3 - m3),
        _f(j1 + j2 + j3 + 1) * _f(j1 - m1) * _f(j1 + m1)
        * _f(j2 - m2) * _f(j2 + m2)))
    S = 0.0
    for v in range(vmin, vmax + 1):
        S += (-1.0) ** int(v + j2 + m2) * float(Fraction(
            _f(j2 + j3 + m1 - v) * _f(j1 - m1 + v),
            _f(v) * _f(j3 - j1 + j2 - v) * _f(j3 + m3 - v)
            * _f(v + j1 - j2 - m3)))
    return np.sqrt(C) * S


def su2_cg(j1, j2, j3):
    """[2j1+1, 2j2+1, 2j3+1] tensor of CG coefficients, m-major order."""
    out = np.zeros((2 * j1 + 1, 2 * j2 + 1, 2 * j3 + 1))
    for i1, m1 in enumerate(range(-j1, j1 + 1)):
        for i2, m2 in enumerate(range(-j2, j2 + 1)):
            for i3, m3 in enumerate(range(-j3, j3 + 1)):
                out[i1, i2, i3] = su2_cg_coeff(j1, m1, j2, m2, j3, m3)
    return out


def change_basis_real_to_complex(l):
    """e3nn's q matrix: complex-SH = q @ real-SH (column convention as in
    e3nn/o3/_wigner.py), with the (-i)^l phase that makes the conjugated
    CG tensors real."""
    q = np.zeros((2 * l + 1, 2 * l + 1), dtype=np.complex128)
    for m in range(-l, 0):
        q[l + m, l + abs(m)] = 1 / np.sqrt(2)
        q[l + m, l - abs(m)] = -1j / np.sqrt(2)
    q[l, l] = 1
    for m in range(1, l + 1):
        q[l + m, l + abs(m)] = (-1) ** m / np.sqrt(2)
        q[l + m, l - abs(m)] = 1j * (-1) ** m / np.sqrt(2)
    return (-1j) ** l * q


@functools.lru_cache(maxsize=None)
def e3nn_w3j(l1, l2, l3):
    """e3nn's real Wigner-3j tensor (unit Frobenius norm) in its SH basis."""
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return None
    Q1 = change_basis_real_to_complex(l1)
    Q2 = change_basis_real_to_complex(l2)
    Q3 = change_basis_real_to_complex(l3)
    C = su2_cg(l1, l2, l3).astype(np.complex128)
    # Contraction variant pinned by exhaustive search: of all conj/transpose
    # placements, exactly two (mutually conjugate) yield REAL tensors that
    # are also rotation-invariant in the e3nn SH basis, and they agree —
    # so the result (incl. sign) is unique.  e3nn's own code asserts
    # realness, hence uses one of these two.
    C = np.einsum("ai,bj,ck,abc->ijk", Q1, Q2, Q3.conj(), C)
    assert np.abs(C.imag).max() < 1e-10, (l1, l2, l3, np.abs(C.imag).max())
    C = C.real
    return C / np.linalg.norm(C)


# -------------------------------------------------------- e3nn real SH

def e3nn_sh_np(vec):
    """e3nn-convention component-normalized real SH l=0..2 (numpy).

    vec: [..., 3] (normalized internally). Order: 1 | l=1 (x,y,z) | l=2
    (xz, xy, 3y^2-1, yz, z^2-x^2) with component normalization.
    """
    v = vec / np.linalg.norm(vec, axis=-1, keepdims=True)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    s3, s15, s5 = np.sqrt(3.0), np.sqrt(15.0), np.sqrt(5.0)
    return np.stack([
        np.ones_like(x),
        s3 * x, s3 * y, s3 * z,
        s15 * x * z,
        s15 * x * y,
        (s5 / 2.0) * (3.0 * y * y - 1.0),
        s15 * y * z,
        (s15 / 2.0) * (z * z - x * x),
    ], axis=-1)


_L_SLICE = {0: slice(0, 1), 1: slice(1, 4), 2: slice(4, 9)}


@functools.lru_cache(maxsize=None)
def basis_change(l):
    """Orthogonal P_l with ours_sh(u) = P_l @ e3nn_sh(u) for all u."""
    if l == 0:
        return np.ones((1, 1))
    rng = np.random.default_rng(7)
    u = rng.normal(size=(256, 3))
    A = e3nn_sh_np(u)[:, _L_SLICE[l]]   # [K, 2l+1]
    B = _sh_np(u)[:, _L_SLICE[l]]       # [K, 2l+1]
    P, *_ = np.linalg.lstsq(A, B, rcond=None)
    P = P.T
    resid = np.abs(A @ P.T - B).max()
    assert resid < 1e-9, (l, resid)
    assert np.abs(P @ P.T - np.eye(2 * l + 1)).max() < 1e-9, (l, P)
    return P


@functools.lru_cache(maxsize=None)
def path_ratio(l1, l2, l3):
    """<(P1 (x) P2 (x) P3) w3j_e3nn, coupling_tensor(l1,l2,l3)> — must be
    ±1: both tensors are unit-norm elements of the same 1-dim invariant
    subspace after the basis change."""
    W = e3nn_w3j(l1, l2, l3)
    C_ref = np.einsum("ia,jb,kc,abc->ijk", basis_change(l1),
                      basis_change(l2), basis_change(l3), W)
    ours = np.asarray(coupling_tensor(l1, l2, l3))
    r = float(np.sum(C_ref * ours))
    assert abs(abs(r) - 1.0) < 1e-6, (l1, l2, l3, r)
    return float(np.sign(r))


def path_weight_multiplier(l1, l2, l3):
    """Scale to apply to imported e3nn per-path weights so our TP matches:
    sign alignment x sqrt(2*l3+1) (e3nn 'component' irrep normalization;
    shared 'element' path fan cancels)."""
    return path_ratio(l1, l2, l3) * np.sqrt(2 * l3 + 1)


def tp_weight_corrections(in_irreps, sh_irreps, out_irreps):
    """Per-scalar-weight multiplier vector of length weight_numel, in our
    path enumeration order (== e3nn instruction order for a fully
    connected TP: i_in outer, i_sh middle, i_out inner)."""
    in_ir, sh_ir, out_ir = Irreps(in_irreps), Irreps(sh_irreps), Irreps(out_irreps)
    paths = tp_paths(in_ir, sh_ir, out_ir)
    mults = []
    for (i, j, k) in paths:
        mul1, l1, _ = in_ir[i]
        _, l2, _ = sh_ir[j]
        mul3, l3, _ = out_ir[k]
        mults.append(np.full(mul1 * mul3, path_weight_multiplier(l1, l2, l3)))
    return np.concatenate(mults)


def correct_weight_dense(dense, in_irreps, sh_irreps, out_irreps):
    """Apply the per-path correction to an imported weight-generator final
    Linear {kernel, bias} (outputs = per-path TP weights)."""
    m = tp_weight_corrections(in_irreps, sh_irreps, out_irreps)
    assert dense["kernel"].shape[-1] == m.size, (
        dense["kernel"].shape, m.size)
    return {"kernel": dense["kernel"] * m[None, :],
            "bias": dense["bias"] * m}
