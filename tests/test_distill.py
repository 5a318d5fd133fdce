"""DDIM sampler + progressive distillation (gen/distill.py).

The toy ground truth throughout: data x0 ~ N(mu, s^2 I).  The posterior-
optimal epsilon prediction is linear in x_t,
    eps*(x_t, t) = sigma_t (x_t - alpha_t mu) / (alpha_t^2 s^2 + sigma_t^2),
which makes every sampler property checkable without training a network.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from codlad_tpu.gen.diffusion import (GaussianDiffusion, create_diffusion,
                                      diffusion_from_tmap)
from codlad_tpu.gen.distill import (ddim_mean, distill_loss_terms,
                                    distill_targets, halve)

MU, S = 0.7, 0.4


def _analytic_eps(d: GaussianDiffusion):
    """Optimal eps model for x0 ~ N(MU, S^2). t arrives as BASE indices
    (the model contract); build base-schedule alpha lookups."""
    # d's own alpha-bars ARE the base values at its tmap entries; model_fn
    # receives BASE t (possibly traced inside lax.scan), so invert the map
    # with a dense lookup table
    tmap = (np.asarray(d.timestep_map) if d.timestep_map is not None
            else np.arange(d.num_timesteps))
    inv_np = np.zeros(int(tmap.max()) + 1, np.int32)
    inv_np[tmap] = np.arange(len(tmap))
    inv = jnp.asarray(inv_np)

    acp = jnp.asarray(np.cumprod(1.0 - np.asarray(d.betas)), jnp.float32)

    def model_fn(x, t_base, rng=None, x_self_cond=None):
        t = inv[t_base]
        a = acp[t].reshape((-1,) + (1,) * (x.ndim - 1))
        alpha, sigma = jnp.sqrt(a), jnp.sqrt(1.0 - a)
        return sigma * (x - alpha * MU) / (a * S**2 + (1.0 - a))

    return model_fn


def test_halve_equals_ddim_respacing():
    t100 = create_diffusion("ddim100", learn_sigma=False)
    t50 = create_diffusion("ddim50", learn_sigma=False)
    s = halve(t100)
    np.testing.assert_allclose(s.betas, t50.betas, rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(s.timestep_map),
                                  np.asarray(t50.timestep_map))
    # odd lengths halve too (top student step covers teacher T-1 -> T-3)
    t25 = halve(t50)
    assert t25.num_timesteps == 25
    t13 = halve(t25)
    assert t13.num_timesteps == 13
    assert int(np.asarray(t13.timestep_map)[-1]) == int(
        np.asarray(t25.timestep_map)[-1])


def test_halve_qsample_levels_coincide():
    teacher = create_diffusion("ddim10", learn_sigma=False)
    student = halve(teacher)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 6, 3)),
                    jnp.float32)
    noise = jnp.zeros_like(x) + 0.3
    for i in range(student.num_timesteps):
        a = student.q_sample(x, jnp.full((4,), i), noise)
        b = teacher.q_sample(x, jnp.full((4,), 2 * i), noise)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_diffusion_from_tmap_roundtrip():
    d = create_diffusion("ddim50", learn_sigma=False)
    d2 = diffusion_from_tmap(np.asarray(d.timestep_map), learn_sigma=False)
    np.testing.assert_allclose(d2.betas, d.betas, rtol=1e-12)


def test_ddim_eta1_is_ancestral_posterior():
    """eta=1 DDIM coefficients equal the ancestral fixed-small posterior:
    same mean given pred_xstart, sigma^2 == posterior_variance."""
    d = create_diffusion("ddim25", learn_sigma=False, sigma_small=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 5, 3)), jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(8, 5, 3)), jnp.float32)
    for ti in [1, 7, 24]:
        t = jnp.full((8,), ti)
        eps = d._predict_eps_from_xstart(x, t, x0)
        acp = d._extract("alphas_cumprod", t, x.ndim)
        acp_prev = d._extract("alphas_cumprod_prev", t, x.ndim)
        sigma = (jnp.sqrt((1 - acp_prev) / (1 - acp))
                 * jnp.sqrt(1 - acp / acp_prev))
        mean_ddim = (jnp.sqrt(acp_prev) * x0
                     + jnp.sqrt(1 - acp_prev - sigma**2) * eps)
        mean_post, var_post, _ = d.q_posterior(x0, x, t)
        np.testing.assert_allclose(np.asarray(mean_ddim),
                                   np.asarray(mean_post), atol=1e-5)
        np.testing.assert_allclose(np.asarray(sigma**2),
                                   np.broadcast_to(np.asarray(var_post),
                                                   sigma.shape),
                                   rtol=1e-3, atol=1e-7)


def test_ddim_converges_to_analytic_gaussian_transport():
    """For Gaussian data the probability-flow map is exact in closed form:
    x(0) = sqrt(a_0) MU + sqrt(a_0 S^2 + 1 - a_0) z with z the normalized
    start noise.  The deterministic DDIM sampler with the exact eps model
    must converge to it FIRST-ORDER in the step count (measured on CPU:
    max errs 0.0089 / 0.021 / 0.080 at 500 / 200 / 50 steps)."""
    noise = jnp.asarray(np.random.default_rng(2).normal(size=(512, 1, 1)),
                        jnp.float32)
    errs = {}
    for steps in (500, 200, 50):
        d = create_diffusion(f"ddim{steps}", learn_sigma=False)
        x = np.asarray(d.ddim_sample_loop(
            jax.random.PRNGKey(0), _analytic_eps(d), noise.shape,
            noise=noise, eta=0.0))
        acp = np.cumprod(1.0 - np.asarray(d.betas))
        aT, a0 = acp[-1], acp[0]
        z = (np.asarray(noise) - np.sqrt(aT) * MU) / np.sqrt(
            aT * S**2 + 1 - aT)
        analytic = np.sqrt(a0) * MU + np.sqrt(a0 * S**2 + 1 - a0) * z
        errs[steps] = np.abs(x - analytic).max()
        assert abs(x.std() - S) < 0.05
    assert errs[500] < 0.012
    assert errs[500] < errs[200] < errs[50] < 0.1
    # first-order: error ~ 1/steps (within a loose factor)
    assert errs[50] / errs[500] > 4.0


def test_distill_target_inverts_student_step():
    """One student DDIM step using x_tilde must land exactly on the
    two-teacher-step point (the closed-form solve is the inverse map)."""
    teacher = create_diffusion("ddim16", learn_sigma=False)
    student = halve(teacher)
    model_fn = _analytic_eps(teacher)
    rng = jax.random.PRNGKey(3)
    x0 = MU + S * jax.random.normal(rng, (16, 4, 2 + 1))  # C=3: no wrap
    i_s = jnp.asarray(np.random.default_rng(4).integers(
        0, student.num_timesteps, size=(16,)))
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    x_t, x_tilde, _ = distill_targets(teacher, student, model_fn, rng,
                                      x0, i_s, noise)
    # replay the two teacher steps for the expected target
    t1 = 2 * i_s
    x0_1 = teacher.p_mean_variance(model_fn(x_t, teacher.map_t(t1)), x_t,
                                   t1)["pred_xstart"]
    x_mid = ddim_mean(teacher, x_t, t1, x0_1)
    t2 = jnp.maximum(t1 - 1, 0)
    x0_2 = teacher.p_mean_variance(model_fn(x_mid, teacher.map_t(t2)),
                                   x_mid, t2)["pred_xstart"]
    x_low = ddim_mean(teacher, x_mid, t2, x0_2)
    first = (t1 > 0).reshape((-1, 1, 1))
    expect = jnp.where(first, x_low, x_mid)
    # one student step from x_t with pred_xstart = x_tilde
    got = ddim_mean(student, x_t, i_s, x_tilde)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=1e-4)


@pytest.mark.slow  # trains a small net through several distillation stages
def test_progressive_distillation_learns_two_steps_in_one():
    """A per-timestep linear student (eps = c_t x + d_t) trained with
    distill_loss_terms learns to reproduce two analytic-teacher DDIM steps
    in one: the distilled 8-step sampler matches the teacher's 16-step
    sampler far better than the undistilled student does."""
    teacher = create_diffusion("ddim16", learn_sigma=False,
                               diffusion_steps=64)
    student = halve(teacher)
    teacher_fn = _analytic_eps(teacher)

    # student params: per-BASE-timestep linear tables, initialized at the
    # teacher's own coefficients (the "init from teacher" of the paper)
    acp_base = np.zeros(64)
    tmap = np.asarray(teacher.timestep_map)
    acp_t = np.cumprod(1.0 - np.asarray(teacher.betas))
    acp_base[tmap] = acp_t
    a = jnp.asarray(acp_base, jnp.float32)
    alpha, sigma = jnp.sqrt(a), jnp.sqrt(np.maximum(1.0 - a, 1e-12))
    c0 = sigma / (a * S**2 + (1.0 - a))
    d0 = -alpha * MU * c0
    params = {"c": c0, "d": d0}

    def student_fn(p, x, t_base, rng=None):
        c = p["c"][t_base].reshape((-1,) + (1,) * (x.ndim - 1))
        d = p["d"][t_base].reshape((-1,) + (1,) * (x.ndim - 1))
        return c * x + d

    def loss(p, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        x0 = MU + S * jax.random.normal(k1, (256, 1, 1))
        i_s = jax.random.randint(k2, (256,), 0, student.num_timesteps)
        terms = distill_loss_terms(
            teacher, student, teacher_fn,
            lambda x, tt, k: student_fn(p, x, tt, k), k3, x0, i_s)
        return terms["loss"].mean()

    tx = optax.adam(3e-3)
    opt = tx.init(params)
    step = jax.jit(lambda p, o, r: _upd(p, o, r, tx, loss))
    rng = jax.random.PRNGKey(5)
    l0 = float(loss(params, jax.random.fold_in(rng, 999)))
    for i in range(400):
        params, opt = step(params, opt, jax.random.fold_in(rng, i))
    l1 = float(loss(params, jax.random.fold_in(rng, 999)))
    assert l1 < 0.2 * l0, (l0, l1)

    # sampler-level check: distilled 8-step vs teacher 16-step transport
    noise = jax.random.normal(jax.random.PRNGKey(6), (512, 1, 1))
    ref = teacher.ddim_sample_loop(jax.random.PRNGKey(0), teacher_fn,
                                   noise.shape, noise=noise)
    fn_trained = lambda x, tt, k=None, x_self_cond=None: student_fn(params, x, tt)
    fn_init = lambda x, tt, k=None, x_self_cond=None: student_fn(
        {"c": c0, "d": d0}, x, tt)
    got = student.ddim_sample_loop(jax.random.PRNGKey(0), fn_trained,
                                   noise.shape, noise=noise)
    naive = student.ddim_sample_loop(jax.random.PRNGKey(0), fn_init,
                                     noise.shape, noise=noise)
    err_distilled = float(jnp.abs(got - ref).mean())
    err_naive = float(jnp.abs(naive - ref).mean())
    assert err_distilled < 0.5 * err_naive, (err_distilled, err_naive)


def _upd(p, o, r, tx, loss):
    g = jax.grad(loss)(p, r)
    up, o = tx.update(g, o, p)
    return optax.apply_updates(p, up), o
