"""Conditional flow matching: five variants as functional JAX classes.

Port of the reference flow stack (reference: diffusion_and_flow/flow.py):
ICFM, exact-OT CFM, Lipman target CFM, Schrödinger-bridge CFM (with score
head weighting), and the variance-preserving trigonometric interpolant.
The reference's quirk of sampling t as sigmoid(N(0,1)) rather than uniform
(flow.py:187-190) is preserved.

Couplings (for otcfm/sbcfm) are pluggable: see gen/ot.py for the on-device
Sinkhorn default and the exact host-callback solver.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from codlad_tpu.gen import ot as ot_mod


def pad_t_like_x(t, x):
    return t.reshape((-1,) + (1,) * (x.ndim - 1))


def sample_t_sigmoid(rng, batch):
    """t = sigmoid(N(0, 1)) — the reference's non-uniform time density."""
    return jax.nn.sigmoid(jax.random.normal(rng, (batch,)))


@dataclasses.dataclass(frozen=True)
class ConditionalFlowMatcher:
    """I-CFM: x_t ~ N(t x1 + (1-t) x0, sigma), u = x1 - x0."""

    sigma: float = 0.0

    def compute_mu_t(self, x0, x1, t):
        t = pad_t_like_x(t, x0)
        return t * x1 + (1 - t) * x0

    def compute_sigma_t(self, t):
        return jnp.full_like(t, self.sigma)

    def compute_conditional_flow(self, x0, x1, t, xt):
        return x1 - x0

    def compute_lambda(self, t):
        sigma_t = self.compute_sigma_t(t)
        return 2 * sigma_t / (self.sigma**2 + 1e-8)

    def sample_location_and_conditional_flow(self, rng, x0, x1, t=None,
                                             return_noise=False):
        k_t, k_eps = jax.random.split(rng)
        if t is None:
            t = sample_t_sigmoid(k_t, x0.shape[0])
        eps = jax.random.normal(k_eps, x0.shape)
        mu_t = self.compute_mu_t(x0, x1, t)
        sigma_t = pad_t_like_x(self.compute_sigma_t(t), x0)
        xt = mu_t + sigma_t * eps
        ut = self.compute_conditional_flow(x0, x1, t, xt)
        if return_noise:
            return t, xt, ut, eps
        return t, xt, ut


@dataclasses.dataclass(frozen=True)
class ExactOptimalTransportConditionalFlowMatcher(ConditionalFlowMatcher):
    """OT-CFM: minibatch exact-OT coupling of (x0, x1), then I-CFM."""

    ot_method: str = "exact"

    def sample_location_and_conditional_flow(self, rng, x0, x1, t=None,
                                             return_noise=False):
        k_plan, rng = jax.random.split(rng)
        x0, x1 = ot_mod.sample_plan(k_plan, x0, x1, method=self.ot_method)
        return super().sample_location_and_conditional_flow(
            rng, x0, x1, t, return_noise)


@dataclasses.dataclass(frozen=True)
class TargetConditionalFlowMatcher(ConditionalFlowMatcher):
    """Lipman-style target OT path: mu = t x1, sigma = 1 - (1 - sigma) t."""

    def compute_mu_t(self, x0, x1, t):
        return pad_t_like_x(t, x1) * x1

    def compute_sigma_t(self, t):
        return 1 - (1 - self.sigma) * t

    def compute_conditional_flow(self, x0, x1, t, xt):
        t = pad_t_like_x(t, x1)
        return (x1 - (1 - self.sigma) * xt) / (1 - (1 - self.sigma) * t)


@dataclasses.dataclass(frozen=True)
class SchrodingerBridgeConditionalFlowMatcher(ConditionalFlowMatcher):
    """SB-CFM: Brownian-bridge sigma sqrt(t(1-t)) with entropic OT coupling."""

    sigma: float = 1.0
    ot_method: str = "exact"

    def compute_sigma_t(self, t):
        return self.sigma * jnp.sqrt(t * (1 - t))

    def compute_conditional_flow(self, x0, x1, t, xt):
        t = pad_t_like_x(t, x0)
        mu_t = t * x1 + (1 - t) * x0
        ratio = (1 - 2 * t) / (2 * t * (1 - t) + 1e-8)
        return ratio * (xt - mu_t) + x1 - x0

    def sample_location_and_conditional_flow(self, rng, x0, x1, t=None,
                                             return_noise=False):
        k_plan, rng = jax.random.split(rng)
        x0, x1 = ot_mod.sample_plan(k_plan, x0, x1, method=self.ot_method,
                                    reg=2 * self.sigma**2)
        return super().sample_location_and_conditional_flow(
            rng, x0, x1, t, return_noise)


@dataclasses.dataclass(frozen=True)
class VariancePreservingConditionalFlowMatcher(ConditionalFlowMatcher):
    """Albergo trigonometric interpolant."""

    def compute_mu_t(self, x0, x1, t):
        t = pad_t_like_x(t, x0)
        return jnp.cos(math.pi / 2 * t) * x0 + jnp.sin(math.pi / 2 * t) * x1

    def compute_conditional_flow(self, x0, x1, t, xt):
        t = pad_t_like_x(t, x0)
        return math.pi / 2 * (jnp.cos(math.pi / 2 * t) * x1
                              - jnp.sin(math.pi / 2 * t) * x0)


FLOW_MATCHERS = {
    "icfm": ConditionalFlowMatcher,
    "otcfm": ExactOptimalTransportConditionalFlowMatcher,
    "fm": TargetConditionalFlowMatcher,
    "sbcfm": SchrodingerBridgeConditionalFlowMatcher,
    "vpfm": VariancePreservingConditionalFlowMatcher,
}
