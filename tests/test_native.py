"""Native C++ helper tests: LAP solver and cell-list radius graph."""

import numpy as np
import pytest

from codlad_tpu import native


def test_native_library_builds():
    lib = native.load()
    assert lib is not None, "g++ build of the native library failed"


def test_lap_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(0)
    for n in (4, 16, 64, 128):
        cost = rng.random((n, n))
        col = native.lap_solve(cost)
        _, want = linear_sum_assignment(cost)
        # optimal cost must match (assignments can differ on ties)
        got_cost = cost[np.arange(n), col].sum()
        want_cost = cost[np.arange(n), want].sum()
        np.testing.assert_allclose(got_cost, want_cost, rtol=1e-12)
        # valid permutation
        assert sorted(col.tolist()) == list(range(n))


def test_radius_graph_matches_dense():
    rng = np.random.default_rng(1)
    n = 300
    xyz = rng.uniform(0, 30, size=(n, 3))
    valid = rng.random(n) > 0.1
    cutoff = 6.0
    got = native.radius_graph(xyz, valid, cutoff)

    pos = np.where(valid[:, None], xyz, 1e6 * (1 + np.arange(n))[:, None])
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    ii, jj = np.where((d <= cutoff) & np.triu(np.ones((n, n), dtype=bool), 1))
    want = set(zip(ii.tolist(), jj.tolist()))
    assert set(map(tuple, got.tolist())) == want


def test_radius_graph_empty_and_far():
    xyz = np.array([[0.0, 0, 0], [100.0, 0, 0]])
    valid = np.array([1, 1], np.uint8)
    assert len(native.radius_graph(xyz, valid, 5.0)) == 0
    assert len(native.radius_graph(xyz, np.zeros(2, np.uint8), 5.0)) == 0
