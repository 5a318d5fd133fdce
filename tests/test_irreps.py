"""Equivariance tests for spherical harmonics and tensor products."""

import jax
import jax.numpy as jnp
import numpy as np

from codlad_tpu.nn.irreps import (
    Irreps,
    coupling_tensor,
    sh_l2,
    tp_paths,
    wigner_d_np,
    _random_rotation,
)
from codlad_tpu.nn.tensor_product import FullyConnectedTP


def test_irreps_parsing():
    ir = Irreps("12x0e + 4x1o + 4x1e + 12x0o")
    assert ir.dim == 12 + 12 + 12 + 12
    assert ir.num_irreps == 32
    assert ir[1] == (4, 1, -1)


def test_sh_component_normalization():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(200000, 3)).astype(np.float32)
    y = np.asarray(sh_l2(jnp.asarray(v)))
    ms = (y**2).mean(0)
    np.testing.assert_allclose(ms, np.ones(9), atol=0.03)


def test_sh_equivariance():
    rng = np.random.default_rng(1)
    rot = _random_rotation(rng)
    v = rng.normal(size=(128, 3))
    y_rot = np.asarray(sh_l2(jnp.asarray((v @ rot.T).astype(np.float32))))
    y = np.asarray(sh_l2(jnp.asarray(v.astype(np.float32))))
    for l in (0, 1, 2):
        sl = {0: slice(0, 1), 1: slice(1, 4), 2: slice(4, 9)}[l]
        D = wigner_d_np(l, rot)
        np.testing.assert_allclose(y_rot[:, sl], y[:, sl] @ D.T, atol=1e-4)


def test_wigner_d1_is_rotation_matrix():
    rng = np.random.default_rng(2)
    rot = _random_rotation(rng)
    np.testing.assert_allclose(wigner_d_np(1, rot), rot, atol=1e-10)


def test_coupling_tensors_exist_and_invariant():
    rng = np.random.default_rng(3)
    for l1, l2, l3 in [(0, 0, 0), (1, 0, 1), (0, 1, 1), (1, 1, 0), (1, 1, 1), (1, 2, 1), (0, 2, 2)]:
        C = coupling_tensor(l1, l2, l3)
        assert C is not None
        np.testing.assert_allclose(np.linalg.norm(C), 1.0, atol=1e-8)
        rot = _random_rotation(rng)
        D1, D2, D3 = (wigner_d_np(l, rot) for l in (l1, l2, l3))
        C_rot = np.einsum("ia,jb,kc,abc->ijk", D1, D2, D3, C)
        np.testing.assert_allclose(C_rot, C, atol=1e-8)
    # (1,1,1) coupling is the Levi-Civita tensor up to normalization
    C = coupling_tensor(1, 1, 1)
    eps = np.zeros((3, 3, 3))
    for i, j, k in [(0, 1, 2), (1, 2, 0), (2, 0, 1)]:
        eps[i, j, k], eps[j, i, k] = 1, -1
    ratio = C / np.where(eps == 0, 1, eps / np.sqrt(6))
    vals = ratio[eps != 0]
    np.testing.assert_allclose(np.abs(vals), np.ones(6), atol=1e-8)


def _rotate_features(irreps, feats, rot):
    """Apply the block-diagonal Wigner rotation to flat features (numpy)."""
    out = np.array(feats, copy=True)
    for (mul, l, p), sl in zip(irreps, irreps.slices()):
        D = wigner_d_np(l, rot)
        block = out[..., sl].reshape(feats.shape[:-1] + (mul, 2 * l + 1))
        out[..., sl] = (block @ D.T).reshape(feats.shape[:-1] + (-1,))
    return out


def test_fully_connected_tp_equivariance():
    in_ir = Irreps("4x0e + 2x1o + 2x1e + 4x0o")
    sh_ir = Irreps("1x0e + 1x1o + 1x2e")
    out_ir = Irreps("4x0e + 2x1o + 2x1e + 4x0o")
    tp = FullyConnectedTP(in_ir, sh_ir, out_ir)

    rng = np.random.default_rng(4)
    x = rng.normal(size=(16, in_ir.dim)).astype(np.float32)
    v = rng.normal(size=(16, 3)).astype(np.float32)
    w = rng.normal(size=(16, tp.weight_numel)).astype(np.float32)

    params = tp.init(jax.random.PRNGKey(0), jnp.asarray(x), sh_l2(jnp.asarray(v)), jnp.asarray(w))
    out = np.asarray(tp.apply(params, jnp.asarray(x), sh_l2(jnp.asarray(v)), jnp.asarray(w)))

    rot = _random_rotation(rng)
    x_rot = _rotate_features(in_ir, x, rot).astype(np.float32)
    v_rot = (v @ rot.T).astype(np.float32)
    out_rot = np.asarray(tp.apply(params, jnp.asarray(x_rot), sh_l2(jnp.asarray(v_rot)), jnp.asarray(w)))

    np.testing.assert_allclose(out_rot, _rotate_features(out_ir, out, rot), atol=2e-4)


def test_tp_output_variance_sane():
    in_ir = Irreps("12x0e + 4x1o + 4x1e + 12x0o")
    sh_ir = Irreps("1x0e + 1x1o + 1x2e")
    out_ir = in_ir
    tp = FullyConnectedTP(in_ir, sh_ir, out_ir)
    rng = np.random.default_rng(5)
    n = 4096
    x = rng.normal(size=(n, in_ir.dim)).astype(np.float32)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    w = rng.normal(size=(n, tp.weight_numel)).astype(np.float32)
    params = tp.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]), sh_l2(jnp.asarray(v[:2])), jnp.asarray(w[:2]))
    out = np.asarray(tp.apply(params, jnp.asarray(x), sh_l2(jnp.asarray(v)), jnp.asarray(w)))
    var = out.var()
    assert 0.2 < var < 5.0, var


def test_tp_paths_respect_parity():
    in_ir = Irreps("2x0o")
    sh_ir = Irreps("1x0e + 1x1o + 1x2e")
    out_ir = Irreps("2x0e + 2x1e + 2x0o")
    paths = tp_paths(in_ir, sh_ir, out_ir)
    # 0o x 0e -> 0o ; 0o x 1o -> 1e ; no path to 0e
    assert (0, 0, 2) in paths
    assert (0, 1, 1) in paths
    assert all(k != 0 for _, _, k in paths)


def test_irreps_layernorm():
    import jax.numpy as jnp
    from codlad_tpu.nn.tensor_product import IrrepsLayerNorm

    ir = Irreps("4x0e + 2x1o")
    m = IrrepsLayerNorm(tuple(ir))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, ir.dim)).astype(np.float32) * 3)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # vector part stays equivariant: rotating input rotates output
    rot = _random_rotation(rng)
    x_rot = np.array(x)
    x_rot[:, 4:] = (x_rot[:, 4:].reshape(16, 2, 3) @ rot.T).reshape(16, 6)
    y_rot = m.apply(params, jnp.asarray(x_rot))
    want = np.array(y)
    want[:, 4:] = (want[:, 4:].reshape(16, 2, 3) @ rot.T).reshape(16, 6)
    np.testing.assert_allclose(np.asarray(y_rot), want, atol=1e-4)
