"""Minimal real-irreps algebra for the fixed ladders this framework uses.

The reference leans on e3nn for O(3) representation bookkeeping (reference:
models/gcn_nn.py:181-219); here the needed pieces are self-contained:

  * `Irreps`: a tuple of (mul, l, p) segments over flat feature vectors,
    mul-major within each segment ([mul, 2l+1] flattened), matching the
    e3nn memory layout convention.
  * spherical harmonics up to l=2, 'component' normalization (each component
    has unit mean square over the sphere).
  * real-basis coupling tensors ("Wigner 3j"): computed numerically once at
    import by solving the rotation-invariance constraint, so no table of
    conventions has to be trusted — the basis is whatever `sh` defines.

Everything is tiny (l <= 2) and static, so all of this folds into compiled
constants.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


class Irreps(tuple):
    """Tuple of (mul, l, p) with p in {+1, -1}."""

    def __new__(cls, spec):
        if isinstance(spec, str):
            parts = []
            for tok in spec.replace(" ", "").split("+"):
                mul, lp = tok.split("x")
                l = int(lp[:-1])
                p = {"e": 1, "o": -1}[lp[-1]]
                parts.append((int(mul), l, p))
            spec = parts
        return super().__new__(cls, tuple(tuple(x) for x in spec))

    @property
    def dim(self):
        return sum(mul * (2 * l + 1) for mul, l, p in self)

    @property
    def num_irreps(self):
        return sum(mul for mul, _, _ in self)

    def slices(self):
        out, i = [], 0
        for mul, l, p in self:
            d = mul * (2 * l + 1)
            out.append(slice(i, i + d))
            i += d
        return out

    def split(self, x):
        """Split [..., dim] into a list of [..., mul, 2l+1] blocks."""
        blocks = []
        for (mul, l, p), sl in zip(self, self.slices()):
            blocks.append(x[..., sl].reshape(x.shape[:-1] + (mul, 2 * l + 1)))
        return blocks

    def merge(self, blocks):
        flat = [b.reshape(b.shape[:-2] + (-1,)) for b in blocks]
        return jnp.concatenate(flat, axis=-1)


SH_IRREPS = Irreps("1x0e + 1x1o + 1x2e")


def sh_l2(vec, normalize=True, eps=1e-12):
    """Real spherical harmonics (l=0,1,2), component normalization.

    vec: [..., 3]. Returns [..., 9] ordered l=0 | l=1 (x,y,z) | l=2.
    Zero vectors (masked/padded edges) are redirected to x̂ BEFORE the norm
    so gradients stay finite (norm grad at 0 is NaN, and 0 * NaN poisons
    masked branches).
    """
    if normalize:
        n2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
        fallback = jnp.zeros_like(vec).at[..., 0].set(1.0)
        vec = jnp.where(n2 > eps, vec, fallback)
        vec = vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    s3, s15, s5 = np.sqrt(3.0), np.sqrt(15.0), np.sqrt(5.0)
    return jnp.stack(
        [
            jnp.ones_like(x),
            s3 * x, s3 * y, s3 * z,
            s15 * x * y,
            s15 * y * z,
            (s5 / 2.0) * (3.0 * z * z - 1.0),
            s15 * x * z,
            (s15 / 2.0) * (x * x - y * y),
        ],
        axis=-1,
    )


def _sh_np(vec):
    n = np.linalg.norm(vec, axis=-1, keepdims=True)
    v = vec / n
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    s3, s15, s5 = np.sqrt(3.0), np.sqrt(15.0), np.sqrt(5.0)
    return np.stack(
        [np.ones_like(x), s3 * x, s3 * y, s3 * z, s15 * x * y, s15 * y * z,
         (s5 / 2.0) * (3 * z * z - 1), s15 * x * z, (s15 / 2.0) * (x * x - y * y)],
        axis=-1,
    )


_L_SLICE = {0: slice(0, 1), 1: slice(1, 4), 2: slice(4, 9)}


def wigner_d_np(l, rot):
    """Rotation matrix of degree l in this module's real SH basis (numpy).

    Solved from Y_l(R u) = D_l(R) Y_l(u) over sample directions.
    """
    if l == 0:
        return np.ones((1, 1))
    rng = np.random.default_rng(12345)
    u = rng.normal(size=(64, 3))
    A = _sh_np(u)[:, _L_SLICE[l]]          # [K, 2l+1]
    B = _sh_np(u @ rot.T)[:, _L_SLICE[l]]  # [K, 2l+1]
    D, *_ = np.linalg.lstsq(A, B, rcond=None)
    return D.T


def _random_rotation(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


@functools.lru_cache(maxsize=None)
def coupling_tensor(l1, l2, l3):
    """Invariant coupling C[(2l1+1),(2l2+1),(2l3+1)], Frobenius norm 1.

    The unique (up to sign) tensor with
    C = (D1(R) x D2(R) x D3(R)) C for all rotations R; returns None if the
    triple is not allowed.  Computed by intersecting the fixed spaces of a
    few random rotations.
    """
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return None
    rng = np.random.default_rng(0)
    d1, d2, d3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    n = d1 * d2 * d3
    mats = []
    for _ in range(3):
        rot = _random_rotation(rng)
        D = np.kron(np.kron(wigner_d_np(l1, rot), wigner_d_np(l2, rot)), wigner_d_np(l3, rot))
        mats.append(D - np.eye(n))
    M = np.concatenate(mats, axis=0)
    _, s, vt = np.linalg.svd(M)
    null = vt[s.size - np.sum(s < 1e-6):] if np.sum(s < 1e-6) else vt[-1:]
    assert null.shape[0] >= 1, f"no invariant for ({l1},{l2},{l3})"
    c = null[0].reshape(d1, d2, d3)
    c = c / np.linalg.norm(c)
    # deterministic sign: first element with largest magnitude positive
    flat = c.reshape(-1)
    c = c * np.sign(flat[np.argmax(np.abs(flat))])
    return c


def tp_paths(in_irreps: Irreps, sh_irreps: Irreps, out_irreps: Irreps):
    """Enumerate allowed fully-connected TP paths (i_in, i_sh, i_out)."""
    paths = []
    for i_in, (mul1, l1, p1) in enumerate(in_irreps):
        for i_sh, (mul2, l2, p2) in enumerate(sh_irreps):
            for i_out, (mul3, l3, p3) in enumerate(out_irreps):
                if p1 * p2 != p3:
                    continue
                if not (abs(l1 - l2) <= l3 <= l1 + l2):
                    continue
                paths.append((i_in, i_sh, i_out))
    return paths
