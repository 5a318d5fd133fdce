"""Minibatch optimal-transport couplings for OT/SB flow matching.

Replaces the reference's POT-on-CPU round trip (reference:
diffusion_and_flow/optimal_transport.py:11-263 `OTPlanSampler`, which moves
the batch device->host->device every step) with:

  * `sinkhorn_plan` — entropic OT fully ON DEVICE (log-domain Sinkhorn, a
    fixed number of [B, B] matmul/rowsoftmax iterations — tiny for the
    batch sizes involved and overlaps with the rest of the step);
  * `exact_plan_host` — exact assignment via the framework's own C++
    Jonker-Volgenant LAP solver (native/codlad_native.cpp lap_solve)
    inside `jax.pure_callback` (uniform marginals with equal batch sizes
    make exact EMD an assignment problem, so this IS the exact plan).

`sample_plan` mirrors OTPlanSampler.sample_plan: returns the re-paired
(x0, x1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_sq_dists(x0, x1):
    a = x0.reshape(x0.shape[0], -1)
    b = x1.reshape(x1.shape[0], -1)
    return (jnp.sum(a**2, 1)[:, None] - 2 * a @ b.T + jnp.sum(b**2, 1)[None, :])


def sinkhorn_plan(cost, reg=0.05, n_iters=100):
    """Log-domain Sinkhorn with uniform marginals; returns the plan [B, B]."""
    B = cost.shape[0]
    log_mu = -jnp.log(B) * jnp.ones(B)
    f = jnp.zeros(B)
    g = jnp.zeros(B)

    def step(_, fg):
        f, g = fg
        f = -reg * jax.nn.logsumexp((-cost + g[None, :]) / reg, axis=1) + reg * log_mu
        g = -reg * jax.nn.logsumexp((-cost + f[:, None]) / reg, axis=0) + reg * log_mu
        return f, g

    f, g = jax.lax.fori_loop(0, n_iters, step, (f, g))
    log_plan = (-cost + f[:, None] + g[None, :]) / reg
    return jnp.exp(log_plan)


def _lap_host(cost):
    from codlad_tpu.native import lap_solve

    return lap_solve(np.asarray(cost, dtype=np.float64))


def exact_assignment(cost):
    """Exact OT assignment (uniform, equal-size marginals) via host LAP."""
    B = cost.shape[0]
    return jax.pure_callback(
        _lap_host, jax.ShapeDtypeStruct((B,), jnp.int32), cost, vmap_method="sequential")


def sample_plan(rng, x0, x1, method="exact", reg=0.05):
    """Re-pair (x0, x1) according to the minibatch OT plan.

    method='exact': deterministic assignment (each x0[i] pairs with one
    x1[j], the exact-EMD plan for uniform equal marginals).
    method='sinkhorn': sample j ~ plan[i, :] per row on device.
    """
    cost = _pairwise_sq_dists(x0, x1)
    if method == "exact":
        col = exact_assignment(cost)
        return x0, x1[col]
    if method == "sinkhorn":
        plan = sinkhorn_plan(cost, reg=reg)
        logits = jnp.log(jnp.maximum(plan, 1e-30))
        col = jax.random.categorical(rng, logits, axis=1)
        return x0, x1[col]
    raise ValueError(method)


def wasserstein(x0, x1, reg=0.05, method="exact"):
    """Minibatch 2-Wasserstein distance (diagnostic; reference
    optimal_transport.py:214-263)."""
    cost = _pairwise_sq_dists(x0, x1)
    if method == "exact":
        col = exact_assignment(cost)
        total = jnp.take_along_axis(cost, col[:, None], axis=1).mean()
    else:
        plan = sinkhorn_plan(cost, reg=reg)
        total = (plan * cost).sum()
    return jnp.sqrt(total)
