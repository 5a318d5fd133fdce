"""Generative-process tests: diffusion schedules/losses/sampling, flows,
OT couplings, ODE solvers."""

import jax
import jax.numpy as jnp
import numpy as np

from codlad_tpu.gen.diffusion import (
    GaussianDiffusion,
    create_diffusion,
    get_named_beta_schedule,
    mean_flat,
    normal_kl,
    space_timesteps,
)
from codlad_tpu.gen.flow import FLOW_MATCHERS
from codlad_tpu.gen.ot import exact_assignment, sample_plan, sinkhorn_plan
from codlad_tpu.gen.solvers import odeint


def test_beta_schedule_and_respacing():
    betas = get_named_beta_schedule("linear", 1000)
    assert betas.shape == (1000,)
    assert betas[0] < betas[-1] < 0.03
    steps = space_timesteps(1000, "ddim100")
    assert len(steps) == 100 and 0 in steps
    d = create_diffusion("ddim100", diffusion_steps=1000)
    assert d.num_timesteps == 100
    assert len(d.timestep_map) == 100
    # map must be the sorted kept base steps
    assert sorted(steps) == list(d.timestep_map)


def test_q_sample_statistics():
    d = create_diffusion(None, diffusion_steps=1000)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.ones((2048, 4))
    t = jnp.full((2048,), 500, jnp.int32)
    noise = jax.random.normal(rng, x0.shape)
    xt = d.q_sample(x0, t, noise)
    acp = float(np.cumprod(1 - np.asarray(d.betas))[500])
    np.testing.assert_allclose(float(xt.mean()), np.sqrt(acp), atol=0.02)
    np.testing.assert_allclose(float(xt.var()), 1 - acp, rtol=0.1)


def test_normal_kl_zero_when_equal():
    kl = normal_kl(jnp.ones(3), jnp.zeros(3), jnp.ones(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(kl), np.zeros(3), atol=1e-7)


def test_mean_flat_mask():
    x = jnp.arange(12, dtype=jnp.float32).reshape(2, 3, 2)
    mask = jnp.ones((2, 3, 2)).at[0, 2].set(0)
    got = mean_flat(x, mask)
    want0 = x[0, :2].mean()
    np.testing.assert_allclose(float(got[0]), float(want0), rtol=1e-6)


def test_training_losses_and_sampling_with_linear_model():
    """A model that predicts eps=0 and var=-1 (min log var) runs end to end."""
    d = create_diffusion("ddim10", diffusion_steps=1000, learn_sigma=True)
    B, L, C = 4, 6, 3

    def model_fn(x, t, rng, **kw):
        return jnp.concatenate([jnp.zeros_like(x), -jnp.ones_like(x)], axis=-1)

    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (B, L, C))
    t = jnp.array([0, 3, 5, 9])
    mask = jnp.ones((B, L, 1))
    terms = d.training_losses(rng, model_fn, x0, t, mask=mask)
    assert terms["loss"].shape == (B,)
    assert np.isfinite(np.asarray(terms["loss"])).all()
    assert (np.asarray(terms["mse"]) >= 0).all()

    sample = jax.jit(lambda r: d.p_sample_loop(r, model_fn, (B, L, C)))(rng)
    assert sample.shape == (B, L, C)
    assert np.isfinite(np.asarray(sample)).all()


def test_masked_loss_ignores_padding():
    d = create_diffusion(None, diffusion_steps=100, learn_sigma=True)

    def model_fn(x, t, rng, **kw):
        return jnp.concatenate([jnp.zeros_like(x), -jnp.ones_like(x)], axis=-1)

    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([10, 50])
    mask = jnp.ones((2, 8, 1)).at[1, 4:].set(0)
    t1 = d.training_losses(rng, model_fn, x0, t, mask=mask, noise=noise)
    x0_p = x0.at[1, 4:].set(1e3)
    t2 = d.training_losses(rng, model_fn, x0_p, t, mask=mask, noise=noise)
    np.testing.assert_allclose(np.asarray(t1["mse"]), np.asarray(t2["mse"]), rtol=1e-5)


def test_flow_matchers_basic():
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (64, 5))
    x1 = jax.random.normal(jax.random.PRNGKey(1), (64, 5)) + 3.0

    for name, cls in FLOW_MATCHERS.items():
        fm = cls()
        t, xt, ut = fm.sample_location_and_conditional_flow(jax.random.PRNGKey(2), x0, x1)
        assert t.shape == (64,)
        assert xt.shape == x0.shape and ut.shape == x0.shape
        assert np.isfinite(np.asarray(xt)).all(), name
        assert np.isfinite(np.asarray(ut)).all(), name
        assert (np.asarray(t) > 0).all() and (np.asarray(t) < 1).all()

    # icfm with sigma=0 and fixed t: xt is the straight interpolation
    fm = FLOW_MATCHERS["icfm"](sigma=0.0)
    t = jnp.full((64,), 0.25)
    _, xt, ut = fm.sample_location_and_conditional_flow(jax.random.PRNGKey(3), x0, x1, t=t)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(0.25 * x1 + 0.75 * x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ut), np.asarray(x1 - x0), atol=1e-5)

    # vpfm endpoints
    fm = FLOW_MATCHERS["vpfm"]()
    _, xt0, _ = fm.sample_location_and_conditional_flow(
        jax.random.PRNGKey(4), x0, x1, t=jnp.zeros(64))
    np.testing.assert_allclose(np.asarray(xt0), np.asarray(x0), atol=1e-5)


def test_exact_ot_improves_cost():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    perm = rng.permutation(32)
    x1 = x0[perm] + 0.01  # a permuted copy: optimal pairing is obvious
    x0n, x1n = sample_plan(jax.random.PRNGKey(0), x0, x1, method="exact")
    cost_after = float(jnp.sum((x0n - x1n) ** 2))
    cost_identity = float(jnp.sum((x0 - x1) ** 2))
    assert cost_after < cost_identity
    assert cost_after < 32 * 4 * 0.01**2 * 10


def test_sinkhorn_marginals():
    rng = jax.random.PRNGKey(0)
    cost = jax.random.uniform(rng, (16, 16))
    plan = sinkhorn_plan(cost, reg=0.1, n_iters=200)
    np.testing.assert_allclose(np.asarray(plan.sum(1)), np.full(16, 1 / 16), atol=1e-4)
    np.testing.assert_allclose(np.asarray(plan.sum(0)), np.full(16, 1 / 16), atol=1e-4)


def test_unbalanced_plan_limits_to_sinkhorn():
    """reg_m -> inf makes the KL marginal penalty hard: the unbalanced plan
    must converge to the balanced Sinkhorn plan (and with moderate reg_m it
    keeps LESS mass on expensive cells)."""
    from codlad_tpu.gen.ot import unbalanced_plan

    rng = np.random.default_rng(1)
    cost = jnp.asarray(rng.uniform(0.0, 2.0, size=(12, 12)).astype(np.float32))
    balanced = sinkhorn_plan(cost, reg=0.1, n_iters=400)
    hard = unbalanced_plan(cost, reg=0.1, reg_m=1e4, n_iters=400)
    np.testing.assert_allclose(np.asarray(hard), np.asarray(balanced),
                               atol=2e-4)
    soft = unbalanced_plan(cost, reg=0.1, reg_m=0.5, n_iters=400)
    # soft marginals: total mass deviates from 1 and expensive cells lose
    # mass relative to the balanced plan
    exp_cost_soft = float((soft * cost).sum() / soft.sum())
    exp_cost_bal = float((balanced * cost).sum())
    assert exp_cost_soft < exp_cost_bal


def test_partial_plan_respects_marginal_caps():
    from codlad_tpu.gen.ot import partial_plan

    rng = np.random.default_rng(2)
    B = 10
    cost = jnp.asarray(rng.uniform(0.0, 2.0, size=(B, B)).astype(np.float32))
    m = 0.6
    plan = np.asarray(partial_plan(cost, reg=0.1, m=m, n_iters=400))
    assert abs(plan.sum() - m) < 1e-4
    assert (plan.sum(1) <= 1 / B + 1e-4).all()
    assert (plan.sum(0) <= 1 / B + 1e-4).all()
    # transported mass should prefer cheap cells: expected cost under the
    # partial plan (normalized) is below the uniform-plan cost
    assert float((plan * np.asarray(cost)).sum() / m) < float(np.mean(cost))


def test_partial_plan_two_by_two_fixture():
    """Hand-checkable 2x2: with cost heavily favoring the diagonal and
    m = 0.5 (half the mass), essentially everything rides the two diagonal
    cells, capped at a_i = 0.5 each -> ~0.25 per diagonal cell."""
    from codlad_tpu.gen.ot import partial_plan

    cost = jnp.asarray([[0.0, 10.0], [10.0, 0.0]], dtype=jnp.float32)
    plan = np.asarray(partial_plan(cost, reg=0.05, m=0.5, n_iters=300))
    np.testing.assert_allclose(plan[0, 0], 0.25, atol=1e-3)
    np.testing.assert_allclose(plan[1, 1], 0.25, atol=1e-3)
    assert plan[0, 1] < 1e-4 and plan[1, 0] < 1e-4


def test_sample_plan_accepts_all_reference_methods():
    """Every OTPlanSampler method string (reference
    optimal_transport.py:44-53) must be accepted end to end."""
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32))
    for method in ("exact", "sinkhorn", "unbalanced", "partial"):
        a, b = sample_plan(jax.random.PRNGKey(0), x0, x1, method=method)
        assert a.shape == x0.shape and b.shape == x1.shape
        assert np.isfinite(np.asarray(a)).all()
        # joint sampling draws pairs from the plan's support: every row of
        # a/b is an actual row of x0/x1
        ax = np.asarray(a)[:, None, :] - np.asarray(x0)[None]
        assert (np.abs(ax).sum(-1).min(1) < 1e-6).all()


def test_otcfm_with_unbalanced_coupling_trains():
    from codlad_tpu.gen.flow import FLOW_MATCHERS

    fm = FLOW_MATCHERS["otcfm"](ot_method="unbalanced")
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.normal(size=(8, 4, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(size=(8, 4, 3)).astype(np.float32))
    t, xt, ut = fm.sample_location_and_conditional_flow(
        jax.random.PRNGKey(0), x0, x1)
    assert xt.shape == x0.shape and ut.shape == x0.shape
    assert np.isfinite(np.asarray(ut)).all()


def test_exact_assignment_identity():
    cost = jnp.asarray(np.array([[0.0, 5, 5], [5, 0, 5], [5, 5, 0]], dtype=np.float32))
    col = exact_assignment(cost)
    assert np.asarray(col).tolist() == [0, 1, 2]


def test_ode_solvers_exponential_decay():
    f = lambda t, x: -x
    x0 = jnp.ones((4, 3))
    for method, tol in [("euler", 5e-3), ("midpoint", 1e-4), ("rk4", 1e-6), ("dopri5", 1e-4)]:
        x1, nfe = odeint(f, x0, 0.0, 1.0, steps=200, method=method)
        np.testing.assert_allclose(np.asarray(x1), np.exp(-1.0) * np.ones((4, 3)),
                                   atol=tol, err_msg=method)
        assert nfe > 0


def test_host_loop_matches_scan_loop():
    d = create_diffusion("ddim5", diffusion_steps=100, learn_sigma=True)

    def model_fn(x, t, rng, **kw):
        return jnp.concatenate([0.1 * x, -jnp.ones_like(x)], axis=-1)

    rng = jax.random.PRNGKey(7)
    a = jax.jit(lambda r: d.p_sample_loop(r, model_fn, (2, 4, 3)))(rng)
    b = d.p_sample_loop_host(rng, model_fn, (2, 4, 3))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_angle_data_wrap_branch():
    """2-channel (angle) data goes through the mod-2 wrap in q_sample/
    sampling (reference gaussian_diffusion.py:348-349,447-448,621-625)."""
    d = create_diffusion("ddim5", diffusion_steps=100, learn_sigma=True)

    def model_fn(x, t, rng, **kw):
        return jnp.concatenate([jnp.zeros_like(x), -jnp.ones_like(x)], axis=-1)

    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (4, 6, 2), minval=-1, maxval=1)
    t = jnp.array([1, 2, 3, 4])
    terms = d.training_losses(rng, model_fn, x0, t)
    assert np.isfinite(np.asarray(terms["loss"])).all()
    s = d.p_sample_loop_host(jax.random.PRNGKey(1), model_fn, (4, 6, 2))
    arr = np.asarray(s)
    assert (arr >= -1 - 1e-5).all() and (arr <= 1 + 1e-5).all()


def test_sigmoid_normal_t_density():
    """Flow t ~ sigmoid(N(0,1)), not uniform (reference flow.py:187-190):
    mass concentrates near 0.5 relative to uniform."""
    fm = FLOW_MATCHERS["icfm"]()
    x = jnp.zeros((20000, 3))
    t, _, _ = fm.sample_location_and_conditional_flow(jax.random.PRNGKey(0), x, x)
    t = np.asarray(t)
    mid = ((t > 0.25) & (t < 0.75)).mean()
    assert mid > 0.6  # uniform would give 0.5


def test_dynamic_loss_weight_schedule():
    from codlad_tpu.train.losses import LossWeights

    w = LossWeights(eta=1.0, zeta=5.0)
    w0 = w.dynamic(0)
    assert w0.eta == 0.0 and w0.zeta == 0.0        # epoch 0 disables xyz+clash
    w10 = w.dynamic(10)
    assert w10.eta == 1.0 and w10.zeta == 5.0      # steady state
    w30 = w.dynamic(30)
    assert w30.zeta == 10.0                        # >20 doubles clash
    woff = w.dynamic(0, dynamic_loss=False)
    assert woff.eta == 1.0 and woff.zeta == 5.0
