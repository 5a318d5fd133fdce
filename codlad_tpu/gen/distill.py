"""Progressive distillation of the DDIM sampler (framework extension).

The reference samples with a 100-step respaced ancestral loop
(reference: test.py:533 -> gaussian_diffusion.py:451) and ships nothing
faster.  This module implements Salimans & Ho's progressive distillation
("Progressive Distillation for Fast Sampling of Diffusion Models", ICLR
2022) over the repo's respaced `GaussianDiffusion`: a student whose
sampling grid is every SECOND teacher step is trained so that one student
DDIM step reproduces two teacher DDIM steps, then the student becomes the
next round's teacher — 100 -> 50 -> 25 -> 13 -> ... steps, multiplying
end-to-end structures/sec at near-constant sample quality.

Everything is a pure function over (teacher, student) schedule pairs and
`model_fn(x, t_base, rng) -> output` callables, so it runs under jit/
shard_map exactly like `GaussianDiffusion.training_losses`.

Grid construction: `halve(teacher)` keeps teacher alpha-bar values at even
respaced indices (`acp[0::2]`), so `student.q_sample(x, i)` equals
`teacher.q_sample(x, 2i)` bit-for-bit and one student step i -> i-1 spans
exactly the two teacher steps 2i -> 2i-1 -> 2i-2 (the final step 0 ->
clean is shared).  Works for odd teacher lengths too (the top student
step then covers teacher steps T-1 -> T-2 -> T-3).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from codlad_tpu.gen.diffusion import GaussianDiffusion, _wrap_pm1, mean_flat


def halve(teacher: GaussianDiffusion) -> GaussianDiffusion:
    """Student diffusion with every second respaced step of `teacher`.

    The student's alpha-bar grid is teacher's at even indices, so noising
    levels coincide: student index i == teacher index 2i."""
    acp = np.cumprod(1.0 - np.asarray(teacher.betas, np.float64))
    keep = np.arange(0, len(acp), 2)
    last = 1.0
    betas = []
    for a in acp[keep]:
        betas.append(1.0 - a / last)
        last = a
    tmap = (np.asarray(teacher.timestep_map)[keep]
            if teacher.timestep_map is not None else keep)
    return dataclasses.replace(teacher, betas=np.asarray(betas),
                               timestep_map=np.asarray(tmap))


def ddim_mean(d: GaussianDiffusion, x, t, pred_xstart):
    """The deterministic (eta=0) DDIM map x_t -> x_{t-1} given the model's
    pred_xstart, vectorized over per-sample respaced indices t [B].
    At t == 0 this returns pred_xstart (alpha_bar_prev == 1)."""
    nd = x.ndim
    eps = d._predict_eps_from_xstart(x, t, pred_xstart)
    acp_prev = d._extract("alphas_cumprod_prev", t, nd)
    out = jnp.sqrt(acp_prev) * pred_xstart + jnp.sqrt(1.0 - acp_prev) * eps
    if x.shape[-1] == 2:
        out = _wrap_pm1(out)
    return out


def two_step_target(teacher: GaussianDiffusion, model_fn, rng, x_t, i_s):
    """x_target: the result of TWO deterministic teacher DDIM steps from
    x_t at teacher index 2*i_s (one step where 2*i_s == 0).  Gradients are
    stopped — the teacher is frozen."""
    t1 = 2 * i_s
    k1, k2 = jax.random.split(rng)
    out1 = model_fn(x_t, teacher.map_t(t1), k1)
    x0_1 = teacher.p_mean_variance(out1, x_t, t1)["pred_xstart"]
    x_mid = ddim_mean(teacher, x_t, t1, x0_1)

    t2 = jnp.maximum(t1 - 1, 0)
    out2 = model_fn(x_mid, teacher.map_t(t2), k2)
    x0_2 = teacher.p_mean_variance(out2, x_mid, t2)["pred_xstart"]
    x_low = ddim_mean(teacher, x_mid, t2, x0_2)

    nd = x_t.ndim
    first = (t1 > 0).reshape((-1,) + (1,) * (nd - 1))
    return jax.lax.stop_gradient(jnp.where(first, x_low, x_mid))


def distill_targets(teacher: GaussianDiffusion, student: GaussianDiffusion,
                    model_fn, rng, x_start, i_s, noise):
    """(x_t, x_tilde, snr_weight) for one distillation batch.

    x_tilde is the x-prediction that makes ONE student DDIM step from x_t
    land exactly on the two-teacher-step point:
        x_s = sqrt(a_prev) x~ + sqrt(1-a_prev) * (x_t - sqrt(a_t) x~)/sqrt(1-a_t)
    solved for x~ (Salimans & Ho eq. 8).  For i_s == 0 (a_prev = 1) the
    formula degenerates to x_tilde = x_target.  snr_weight is the paper's
    truncated-SNR loss weight max(a_t/(1-a_t), 1)."""
    nd = x_start.ndim
    x_t = student.q_sample(x_start, i_s, noise)
    if x_t.shape[-1] == 2:
        x_t = _wrap_pm1(x_t)
    x_target = two_step_target(teacher, model_fn, rng, x_t, i_s)

    a_t = student._extract("alphas_cumprod", i_s, nd)
    a_prev = student._extract("alphas_cumprod_prev", i_s, nd)
    c1 = jnp.sqrt((1.0 - a_prev) / (1.0 - a_t))
    denom = jnp.sqrt(a_prev) - c1 * jnp.sqrt(a_t)
    x_tilde = (x_target - c1 * x_t) / denom
    snr_w = jnp.maximum(a_t / (1.0 - a_t), 1.0)
    return x_t, jax.lax.stop_gradient(x_tilde), snr_w


def distill_loss_terms(teacher: GaussianDiffusion,
                       student: GaussianDiffusion,
                       teacher_fn, student_fn, rng, x_start, i_s,
                       mask=None, noise=None):
    """Per-sample distillation losses (mirrors training_losses' contract:
    dict with 'loss' [B] and 'mse' [B]).

    teacher_fn/student_fn: model_fn(x, t_base, rng) -> output in the
    model's own parametrization; both are interpreted through
    p_mean_variance, so epsilon- and x-prediction teachers distill
    identically (the loss lives in x-space, weighted by truncated SNR)."""
    if noise is None:
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, x_start.shape)
    if x_start.shape[-1] == 2:
        noise = _wrap_pm1(noise)
    rng, k_teacher, k_student = jax.random.split(rng, 3)
    x_t, x_tilde, snr_w = distill_targets(teacher, student, teacher_fn,
                                          k_teacher, x_start, i_s, noise)
    s_out = student_fn(x_t, student.map_t(i_s), k_student)
    x_hat = student.p_mean_variance(s_out, x_t, i_s)["pred_xstart"]
    diff = x_tilde - x_hat
    if diff.shape[-1] == 2:
        diff = _wrap_pm1(diff)
    mse = mean_flat(diff**2, mask)
    loss = mean_flat(snr_w * diff**2, mask)
    return {"loss": loss, "mse": mse}
