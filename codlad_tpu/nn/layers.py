"""Shared conditioning layers: timestep embedding and adaLN output head.

(reference: models/latent_model.py:21-75 `FinalLayer` / `TimestepEmbedder`)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_init(fan_in):
    """Dense init kwargs reproducing the reference's effective scheme:
    xavier-uniform weights (the model-wide `xavier_uniform_` loop over
    p.dim()>1, latent_model.py:151-153) and — crucially — torch
    nn.Linear's DEFAULT bias init U(-1/sqrt(fan_in), +1/sqrt(fan_in)),
    which the loop does not touch.

    The nonzero biases are load-bearing, not a cosmetic parity detail:
    this architecture gates the WHOLE trunk through zero-initialized
    adaLN gates (h = g * modulate(LN(...))), so every gate gradient is
    the product <downstream_grad, modulation>.  With flax's default
    zero biases, PFF(0) = 0 and chain(0) = 0 make the modulation
    factor identically zero wherever the gate already zeroes the
    downstream factor — an EXACT mutual deadlock in which no layer
    gate can ever receive gradient and the network trains to the
    constant predictor (loss ~= E|eps|^2).  torch's nonzero bias
    breaks the tie; this reproduces it."""
    bound = 1.0 / np.sqrt(fan_in)

    def bias_init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return dict(kernel_init=nn.initializers.xavier_uniform(),
                bias_init=bias_init)


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
        h = nn.Dense(self.hidden_size,
                     **torch_linear_init(self.frequency_embedding_size))(t_freq)
        h = jax.nn.silu(h)
        return nn.Dense(self.hidden_size,
                        **torch_linear_init(self.hidden_size))(h)


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
        return nn.Dense(self.out_size,
                        **torch_linear_init(self.hidden_size))(x)
