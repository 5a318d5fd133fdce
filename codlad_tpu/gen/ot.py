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


def unbalanced_plan(cost, reg=0.05, reg_m=1.0, n_iters=200):
    """Unbalanced entropic OT (Sinkhorn-Knopp with KL-relaxed marginals;
    reference method 'unbalanced' -> pot.unbalanced.sinkhorn_knopp_unbalanced,
    optimal_transport.py:48-49), log-domain on device.

    The marginal constraints are soft: each scaling step is damped by
    fi = reg_m / (reg_m + reg), so mass may be created/destroyed where
    transport is too expensive.  reg_m -> inf recovers balanced Sinkhorn."""
    B0, B1 = cost.shape
    log_a = -jnp.log(B0) * jnp.ones(B0)
    log_b = -jnp.log(B1) * jnp.ones(B1)
    fi = reg_m / (reg_m + reg)
    mk = -cost / reg  # log K

    def step(_, uv):
        log_u, log_v = uv
        log_u = fi * (log_a - jax.nn.logsumexp(mk + log_v[None, :], axis=1))
        log_v = fi * (log_b - jax.nn.logsumexp(mk + log_u[:, None], axis=0))
        return log_u, log_v

    log_u, log_v = jax.lax.fori_loop(
        0, n_iters, step, (jnp.zeros(B0), jnp.zeros(B1)))
    return jnp.exp(log_u[:, None] + mk + log_v[None, :])


def partial_plan(cost, reg=0.05, m=None, n_iters=200):
    """Entropic partial OT (reference method 'partial' ->
    pot.partial.entropic_partial_wasserstein, optimal_transport.py:50-51):
    transport only mass `m` (default min(|a|, |b|), POT's default) under
    inequality marginal constraints, via cyclic Dykstra-like projections
    onto {P1 <= a}, {P^T 1 <= b}, {sum P = m} (Benamou et al. 2015).

    Log-domain on device: each projection is a row/col logsumexp and a
    clamped correction, so the whole solve is a fori_loop of [B, B]
    elementwise/reduce work."""
    B0, B1 = cost.shape
    log_a = -jnp.log(B0) * jnp.ones(B0)
    log_b = -jnp.log(B1) * jnp.ones(B1)
    log_m = jnp.log(jnp.minimum(1.0, 1.0) if m is None else m)
    lk = -cost / reg
    # start from K scaled to total mass m (POT: K = exp(-M/reg) * m / |K|)
    lk = lk + (log_m - jax.nn.logsumexp(lk))

    def step(_, lk):
        # rows: scale down any row exceeding a_i (never up)
        row = jax.nn.logsumexp(lk, axis=1)
        lk = lk + jnp.minimum(log_a - row, 0.0)[:, None]
        # cols: same for b_j
        col = jax.nn.logsumexp(lk, axis=0)
        lk = lk + jnp.minimum(log_b - col, 0.0)[None, :]
        # total mass back to m
        lk = lk + (log_m - jax.nn.logsumexp(lk))
        return lk

    lk = jax.lax.fori_loop(0, n_iters, step, lk)
    return jnp.exp(lk)


def _lap_host(cost):
    from codlad_tpu.native import lap_solve

    return lap_solve(np.asarray(cost, dtype=np.float64))


def exact_assignment(cost):
    """Exact OT assignment (uniform, equal-size marginals) via host LAP."""
    B = cost.shape[0]
    return jax.pure_callback(
        _lap_host, jax.ShapeDtypeStruct((B,), jnp.int32), cost, vmap_method="sequential")


def sample_plan(rng, x0, x1, method="exact", reg=0.05, reg_m=1.0,
                partial_mass=None):
    """Re-pair (x0, x1) according to the minibatch OT plan.  Accepts every
    reference OTPlanSampler method (optimal_transport.py:44-53).

    method='exact': deterministic assignment (each x0[i] pairs with one
    x1[j], the exact-EMD plan for uniform equal marginals).
    method='sinkhorn': sample j ~ plan[i, :] per row on device.
    method='unbalanced' / 'partial': the plan's marginals are NOT uniform,
    so (i, j) pairs are sampled JOINTLY from the flattened plan (the
    reference's sample_map with replace=True, optimal_transport.py:96-142)
    — rows of x0 may repeat or drop.
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
    if method in ("unbalanced", "partial"):
        if method == "unbalanced":
            plan = unbalanced_plan(cost, reg=reg, reg_m=reg_m)
        else:
            plan = partial_plan(cost, reg=reg, m=partial_mass)
        B0, B1 = cost.shape
        flat = jnp.log(jnp.maximum(plan.reshape(-1), 1e-30))
        pair = jax.random.categorical(rng, flat, shape=(x0.shape[0],))
        return x0[pair // B1], x1[pair % B1]
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
