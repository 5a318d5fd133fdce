"""Radial bases and invariant message blocks (decoder message passing).

Mirrors the reference building blocks (reference: models/gcn_nn.py:168-381):
Gaussian distance smearing for the encoder graphs, PaiNN sinc radial basis +
cosine cutoff envelope for the IC decoder, and the invariant message
phi(s_j) * W(d_ij).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def swish(x):
    return x * jax.nn.sigmoid(x)


ACTIVATIONS = {
    "swish": swish,
    "ReLU": jax.nn.relu,
    "Tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "ELU": jax.nn.elu,
    "LeakyReLU": jax.nn.leaky_relu,
}


class GaussianSmearing(nn.Module):
    """RBF embedding of edge distances on [start, stop]."""

    start: float = 0.0
    stop: float = 5.0
    num_gaussians: int = 50

    @nn.compact
    def __call__(self, dist):
        offset = np.linspace(self.start, self.stop, self.num_gaussians)
        coeff = -0.5 / float(offset[1] - offset[0]) ** 2
        diff = dist[..., None] - jnp.asarray(offset, dist.dtype)
        return jnp.exp(coeff * diff**2)


def painn_radial_basis(dist, n_rbf, cutoff):
    """sin(n pi d / cutoff) / d basis, with the sinc limit at d=0."""
    shape_d = dist[..., None]
    n = jnp.arange(1, n_rbf + 1, dtype=dist.dtype)
    coef = n * np.pi / cutoff
    denom = jnp.where(shape_d == 0, 1.0, shape_d)
    num = jnp.where(shape_d == 0, coef, jnp.sin(coef * shape_d))
    return jnp.where(shape_d >= cutoff, 0.0, num / denom)


def cosine_envelope(d, cutoff):
    out = 0.5 * (jnp.cos(np.pi * d / cutoff) + 1.0)
    return jnp.where(d >= cutoff, 0.0, out)


class DistanceEmbed(nn.Module):
    n_rbf: int
    cutoff: float
    feat_dim: int

    @nn.compact
    def __call__(self, dist):
        rbf = painn_radial_basis(dist, self.n_rbf, self.cutoff)
        feats = nn.Dense(self.feat_dim)(rbf)
        return feats * cosine_envelope(dist, self.cutoff)[..., None]


class InvariantMessage(nn.Module):
    """phi(s_j) * W(d_ij) over a per-sample padded edge list.

    Call with node scalars [B, N, F], per-edge distances [B, E], and an
    EdgeOps (nn/graph.py); returns per-edge messages [B, E, F_out].
    """

    in_feat_dim: int
    out_feat_dim: int
    n_rbf: int
    cutoff: float

    @nn.compact
    def __call__(self, s, dist, ops):
        phi = nn.Dense(self.in_feat_dim)(s)
        phi = swish(phi)
        phi = nn.Dense(self.out_feat_dim)(phi)
        w_s = DistanceEmbed(self.n_rbf, self.cutoff, self.out_feat_dim)(dist)
        return ops.gather_dst(phi) * w_s
