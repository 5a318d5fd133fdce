"""ODE integrators for flow sampling, as jit-able lax.scan loops.

Replaces torchdiffeq's Python-loop `odeint` (reference: test.py:214-250
`run_sampling`) with scan-compiled fixed-step solvers plus an adaptive
dopri5 with a static step budget; also counts function evaluations (NFE)
like the reference's NFECount wrapper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def odeint(f, x0, t0=0.0, t1=1.0, steps=100, method="euler",
           rtol=1e-5, atol=1e-5):
    """Integrate dx/dt = f(t, x) from t0 to t1. Returns (x1, nfe).

    f(t: scalar, x) -> dx. Fixed-step methods scan `steps` intervals;
    rtol/atol apply to dopri5 only (reference: torchdiffeq odeint
    tolerances, test.py:235-237).
    """
    dt = (t1 - t0) / steps

    if method == "euler":
        def step(x, i):
            t = t0 + i * dt
            return x + dt * f(t, x), None
        nfe_per = 1
    elif method == "midpoint":
        def step(x, i):
            t = t0 + i * dt
            k1 = f(t, x)
            return x + dt * f(t + dt / 2, x + dt / 2 * k1), None
        nfe_per = 2
    elif method == "rk4":
        def step(x, i):
            t = t0 + i * dt
            k1 = f(t, x)
            k2 = f(t + dt / 2, x + dt / 2 * k1)
            k3 = f(t + dt / 2, x + dt / 2 * k2)
            k4 = f(t + dt, x + dt * k3)
            return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4), None
        nfe_per = 4
    elif method == "dopri5":
        return _dopri5(f, x0, t0, t1, rtol=rtol, atol=atol,
                       max_steps=steps * 4)
    else:
        raise ValueError(method)

    x, _ = jax.lax.scan(step, x0, jnp.arange(steps, dtype=jnp.float32))
    return x, steps * nfe_per


# Dormand-Prince 5(4) Butcher tableau
_DP_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DP_B4 = jnp.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
                    187 / 2100, 1 / 40])


def _dopri5(f, x0, t0, t1, rtol=1e-5, atol=1e-5, max_steps=400):
    """Adaptive Dormand-Prince with a static iteration budget (steps where
    t has already reached t1 are no-ops). Returns (x1, nfe)."""

    def rk_step(t, x, dt):
        ks = []
        for i in range(7):
            xi = x
            for j, a in enumerate(_DP_A[i]):
                xi = xi + dt * a * ks[j]
            ks.append(f(t + _DP_C[i] * dt, xi))
        k = jnp.stack(ks)
        x5 = x + dt * jnp.tensordot(_DP_B5, k, axes=1)
        x4 = x + dt * jnp.tensordot(_DP_B4, k, axes=1)
        return x5, x5 - x4

    def cond(state):
        t, x, dt, nfe, i = state
        return (t < t1) & (i < max_steps)

    def body(state):
        t, x, dt, nfe, i = state
        dt = jnp.minimum(dt, t1 - t)
        x5, err = rk_step(t, x, dt)
        tol = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(x5))
        ratio = jnp.sqrt(jnp.mean((err / tol) ** 2))
        accept = ratio <= 1.0
        t_new = jnp.where(accept, t + dt, t)
        x_new = jnp.where(accept, x5, x)
        factor = jnp.clip(0.9 * ratio ** (-0.2), 0.2, 5.0)
        dt_new = dt * factor
        return (t_new, x_new, dt_new, nfe + 7, i + 1)

    t = jnp.asarray(t0, jnp.float32)
    dt = jnp.asarray((t1 - t0) / 50.0, jnp.float32)
    state = (t, x0, dt, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    t, x, dt, nfe, _ = jax.lax.while_loop(cond, body, state)
    return x, nfe
