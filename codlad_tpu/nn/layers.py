"""Shared conditioning layers: timestep embedding and adaLN output head.

(reference: models/latent_model.py:21-75 `FinalLayer` / `TimestepEmbedder`)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def timestep_embedding(t, dim, max_period=10000):
    """Sinusoidal embeddings; t may be fractional (flows) or integer
    (diffusion). t: [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    frequency_embedding_size: int = 256

    @nn.compact
    def __call__(self, t):
        t_freq = timestep_embedding(t, self.frequency_embedding_size)
        h = nn.Dense(self.hidden_size)(t_freq)
        h = jax.nn.silu(h)
        return nn.Dense(self.hidden_size)(h)


class FinalLayer(nn.Module):
    """adaLN-modulated LayerNorm -> Linear projection."""

    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, x, c):
        mods = nn.Dense(2 * self.hidden_size, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(jax.nn.silu(c))
        shift, scale = jnp.split(mods, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x)
        x = x * (1 + scale[:, None, :]) + shift[:, None, :]
        return nn.Dense(self.out_size)(x)
