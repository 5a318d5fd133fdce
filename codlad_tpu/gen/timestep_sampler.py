"""Timestep schedule samplers for diffusion training.

Port of the reference's sampler module (reference:
diffusion_and_flow/timestep_sampler.py — imported nowhere on its main path,
but part of the component inventory): uniform sampling, and the
importance-sampling LossSecondMomentResampler whose loss history sync uses
a plain jnp mean under data-parallel sharding (the reference calls
torch.distributed.all_gather; under jit+Mesh the same reduction is a
compiler-inserted collective).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class UniformSampler:
    def __init__(self, num_timesteps):
        self.num_timesteps = num_timesteps

    def sample(self, rng, batch):
        t = jax.random.randint(rng, (batch,), 0, self.num_timesteps)
        weights = jnp.ones((batch,))
        return t, weights


class LossSecondMomentResampler:
    """Importance-sample t proportional to sqrt(E[loss^2]) with uniform
    mixing; weights de-bias the objective.  History lives host-side (numpy),
    updated from per-step (t, loss) pairs."""

    def __init__(self, num_timesteps, history_per_term=10, uniform_prob=0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros((num_timesteps, history_per_term), np.float64)
        self._loss_counts = np.zeros(num_timesteps, np.int64)

    def _warmed_up(self):
        return (self._loss_counts == self.history_per_term).all()

    def weights(self):
        if not self._warmed_up():
            return np.ones(self.num_timesteps, np.float64)
        w = np.sqrt((self._loss_history**2).mean(-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def sample(self, rng, batch):
        w = self.weights()
        p = w / w.sum()
        t = jax.random.choice(rng, self.num_timesteps, (batch,),
                              p=jnp.asarray(p, jnp.float32))
        weights = 1.0 / (self.num_timesteps * jnp.asarray(p, jnp.float32)[t])
        return t, weights

    def update_with_losses(self, ts, losses):
        """ts, losses: host arrays [B] (already globally gathered under DP —
        metrics coming out of a jitted sharded step are global)."""
        for t, loss in zip(np.asarray(ts), np.asarray(losses)):
            t = int(t)
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1
