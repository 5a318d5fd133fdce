"""e3nn basis-convention reconstruction (convert/e3nn_basis.py).

Verifies, without e3nn installed, that the reconstructed conventions are
internally consistent and that our FullyConnectedTP with per-path
corrected weights reproduces e3nn's FullyConnectedTensorProduct semantics
(reference models/gcn_nn.py:181-219) exactly.
"""

import numpy as np
import pytest

from codlad_tpu.convert import e3nn_basis as eb
from codlad_tpu.nn.irreps import Irreps, sh_l2, tp_paths, _sh_np

TRIPLES = [(0, 0, 0), (0, 1, 1), (1, 0, 1), (1, 1, 0), (1, 1, 1),
           (1, 1, 2), (1, 2, 1), (1, 2, 2), (0, 2, 2), (2, 0, 2),
           (2, 1, 1), (2, 1, 2), (2, 2, 0), (2, 2, 1), (2, 2, 2)]


def _rand_rot(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _wigner_d_e3nn(l, rot):
    rng = np.random.default_rng(3)
    u = rng.normal(size=(64, 3))
    A = eb.e3nn_sh_np(u)[:, eb._L_SLICE[l]]
    B = eb.e3nn_sh_np(u @ rot.T)[:, eb._L_SLICE[l]]
    D, *_ = np.linalg.lstsq(A, B, rcond=None)
    return D.T


def test_w3j_known_values():
    np.testing.assert_allclose(eb.e3nn_w3j(0, 0, 0), np.ones((1, 1, 1)))
    # (1,1,0): identity / sqrt(3)
    np.testing.assert_allclose(eb.e3nn_w3j(1, 1, 0)[:, :, 0],
                               np.eye(3) / np.sqrt(3), atol=1e-12)
    # (1,1,1): Levi-Civita / sqrt(6), positive (0,1,2) element (the value
    # e3nn's o3.wigner_3j(1,1,1) prints)
    W = eb.e3nn_w3j(1, 1, 1)
    eps = np.zeros((3, 3, 3))
    for (i, j, k), s in [((0, 1, 2), 1), ((1, 2, 0), 1), ((2, 0, 1), 1),
                         ((0, 2, 1), -1), ((2, 1, 0), -1), ((1, 0, 2), -1)]:
        eps[i, j, k] = s
    np.testing.assert_allclose(W, eps / np.sqrt(6), atol=1e-12)


def test_w3j_invariance_and_norm():
    rng = np.random.default_rng(42)
    rots = [_rand_rot(rng) for _ in range(3)]
    for (l1, l2, l3) in TRIPLES:
        W = eb.e3nn_w3j(l1, l2, l3)
        assert abs(np.linalg.norm(W) - 1.0) < 1e-10
        for rot in rots:
            W2 = np.einsum("ia,jb,kc,abc->ijk", _wigner_d_e3nn(l1, rot),
                           _wigner_d_e3nn(l2, rot), _wigner_d_e3nn(l3, rot), W)
            np.testing.assert_allclose(W2, W, atol=1e-8)


def test_basis_changes():
    # l=1: e3nn orders Y1 as (x, y, z) — identical to ours
    np.testing.assert_allclose(eb.basis_change(1), np.eye(3), atol=1e-9)
    # l=2: orthogonal, maps e3nn sh to ours exactly
    P2 = eb.basis_change(2)
    np.testing.assert_allclose(P2 @ P2.T, np.eye(5), atol=1e-9)
    rng = np.random.default_rng(11)
    u = rng.normal(size=(32, 3))
    np.testing.assert_allclose(eb.e3nn_sh_np(u)[:, 4:] @ P2.T,
                               _sh_np(u)[:, 4:], atol=1e-9)


def test_path_ratios_are_signs():
    for t in TRIPLES:
        r = eb.path_ratio(*t)
        assert r in (1.0, -1.0), (t, r)


def _e3nn_fctp_np(in_ir, sh_ir, out_ir, x, y, weights):
    """Numpy model of e3nn o3.FullyConnectedTensorProduct(shared_weights=
    False), irrep_normalization='component', path_normalization='element':
    per-path coefficient sqrt((2*l3+1)/fan_out), e3nn w3j couplings, e3nn
    basis features. Instruction order: i_in1 outer, i_in2, i_out inner."""
    paths = tp_paths(in_ir, sh_ir, out_ir)
    fan = {}
    for (i, j, k) in paths:
        fan[k] = fan.get(k, 0) + in_ir[i][0] * sh_ir[j][0]
    xb = [np.asarray(b) for b in in_ir.split(x)]
    yb = [np.asarray(b) for b in sh_ir.split(y)]
    out = [np.zeros(x.shape[:-1] + (mul, 2 * l + 1)) for (mul, l, p) in out_ir]
    off = 0
    for (i, j, k) in paths:
        mul1, l1, _ = in_ir[i]
        _, l2, _ = sh_ir[j]
        mul3, l3, _ = out_ir[k]
        C = eb.e3nn_w3j(l1, l2, l3)
        sz = mul1 * mul3
        w = weights[..., off:off + sz].reshape(weights.shape[:-1] + (mul1, mul3))
        off += sz
        pw = np.sqrt((2 * l3 + 1) / fan[k])
        out[k] = out[k] + pw * np.einsum(
            "...ua,...b,abc,...uv->...vc", xb[i], yb[j].squeeze(-2), C, w)
    return out_ir.merge([np.asarray(o) for o in out])


@pytest.mark.parametrize("ladder_step", [0, 1, 2])
def test_tp_parity_with_e3nn_semantics(ladder_step):
    """our TP(corrected weights) == e3nn TP(raw weights) on the encoder's
    actual irreps ladders, for random inputs/edges/weights."""
    import jax.numpy as jnp
    from codlad_tpu.models.encoder import irrep_ladder
    from codlad_tpu.nn.tensor_product import FullyConnectedTP

    ladder = irrep_ladder(12, 4)
    in_ir = ladder[min(ladder_step, 3)]
    out_ir = ladder[min(ladder_step + 1, 3)]
    sh_ir = Irreps("1x0e + 1x1o + 1x2e")

    rng = np.random.default_rng(ladder_step)
    E = 7
    x = rng.normal(size=(E, in_ir.dim))
    v = rng.normal(size=(E, 3))
    numel = int(np.sum([in_ir[i][0] * out_ir[k][0]
                        for (i, j, k) in tp_paths(in_ir, sh_ir, out_ir)]))
    w = rng.normal(size=(E, numel))

    # e3nn side: features l<=1 so the e3nn basis == ours (P0=P1=I);
    # edge SH in the e3nn convention.
    ref = _e3nn_fctp_np(in_ir, sh_ir, out_ir, x, eb.e3nn_sh_np(v), w)

    # our side: our SH + numerically-solved couplings + corrected weights
    mult = eb.tp_weight_corrections(in_ir, sh_ir, out_ir)
    tp = FullyConnectedTP(tuple(in_ir), tuple(sh_ir), tuple(out_ir))
    got = tp.apply({}, jnp.asarray(x), sh_l2(jnp.asarray(v)),
                   jnp.asarray(w * mult[None, :]))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_tp_parity_rotated_edges():
    """Parity holds under arbitrary rotation of the edge vectors (exercises
    the l=2 mixing block of P2)."""
    import jax.numpy as jnp
    from codlad_tpu.models.encoder import irrep_ladder
    from codlad_tpu.nn.tensor_product import FullyConnectedTP

    ladder = irrep_ladder(12, 4)
    in_ir, out_ir = ladder[3], ladder[3]
    sh_ir = Irreps("1x0e + 1x1o + 1x2e")
    rng = np.random.default_rng(99)
    rot = _rand_rot(rng)
    x = rng.normal(size=(5, in_ir.dim))
    v = rng.normal(size=(5, 3)) @ rot.T
    numel = int(np.sum([in_ir[i][0] * out_ir[k][0]
                        for (i, j, k) in tp_paths(in_ir, sh_ir, out_ir)]))
    w = rng.normal(size=(5, numel))
    ref = _e3nn_fctp_np(in_ir, sh_ir, out_ir, x, eb.e3nn_sh_np(v), w)
    mult = eb.tp_weight_corrections(in_ir, sh_ir, out_ir)
    tp = FullyConnectedTP(tuple(in_ir), tuple(sh_ir), tuple(out_ir))
    got = tp.apply({}, jnp.asarray(x), sh_l2(jnp.asarray(v)),
                   jnp.asarray(w * mult[None, :]))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_w3j_matches_pinned_fixtures():
    """The 15 reconstructed Wigner-3j tensors (all valid l<=2 paths) match
    the committed fixtures (tests/fixtures/e3nn_w3j.npz, generated by
    scripts/gen_e3nn_fixtures.py — which also diffs them against e3nn
    itself on any machine where e3nn is installable).  Catches silent
    drift in the first-principles reconstruction."""
    import os

    fix = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                               "e3nn_w3j.npz"))
    n = 0
    for l1 in range(3):
        for l2 in range(3):
            for l3 in range(abs(l1 - l2), min(l1 + l2, 2) + 1):
                want = fix[f"w3j_{l1}_{l2}_{l3}"]
                got = np.asarray(eb.e3nn_w3j(l1, l2, l3), np.float64)
                np.testing.assert_allclose(got, want, atol=1e-12,
                                           err_msg=f"w3j({l1},{l2},{l3})")
                n += 1
    assert n == 15
