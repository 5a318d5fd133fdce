"""Gaussian diffusion (iDDPM lineage) as pure functions over static schedules.

Functional JAX port of the reference diffusion stack (reference:
diffusion_and_flow/gaussian_diffusion.py, respace.py, __init__.py):

  * schedules precomputed in float64 numpy at construction, stored as jnp
    constants — everything downstream jit-compiles;
  * `training_losses` with sequence-mask-aware `mean_flat`, learned-range
    variance VB term, and the angle-wrap branch for 2-channel data;
  * the FULL sampling loop is one `lax.scan` over respaced timesteps — the
    100-step DDIM-spaced ensemble generation compiles to a single XLA
    program (the reference runs a Python loop of 100 sequential CUDA
    launches, gaussian_diffusion.py:496-547).

Model signature: model_fn(x, t, rng) -> output (mean or mean|var split on
the last axis). Timestep respacing is handled by mapping scan indices
through `timestep_map` before calling the model.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def mean_flat(x, mask=None):
    """Mean over non-batch axes, optionally only where mask is nonzero
    (reference gaussian_diffusion.py:16-26)."""
    axes = tuple(range(1, x.ndim))
    if mask is None:
        return x.mean(axes)
    x = x * mask
    return x.sum(axes) / jnp.maximum(mask.sum(axes), 1.0)


def get_named_beta_schedule(name, num_steps):
    if name == "linear":
        scale = 1000 / num_steps
        return np.linspace(scale * 1e-4, scale * 0.02, num_steps, dtype=np.float64)
    if name == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = []
        for i in range(num_steps):
            t1, t2 = i / num_steps, (i + 1) / num_steps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.array(betas)
    raise ValueError(name)


def space_timesteps(num_timesteps, section_counts):
    """Subset of base timesteps to retain ("ddimN" or strided sections;
    reference respace.py:12-62)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} ddim steps")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx, all_steps = 0, []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            all_steps.append(start_idx + round(cur))
            cur += stride
        start_idx += size
    return set(all_steps)


def _wrap_pm1(x):
    """Angle wrap into [-1, 1) used for 2-channel angle data (reference
    gaussian_diffusion.py:348-349, 447-448, 621-625)."""
    return (x + 1) % 2 - 1


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """mean_type: 'epsilon'|'xstart'; var_type: 'learned_range'|
    'fixed_small'|'fixed_large'; loss: 'mse'|'rescaled_mse'|'kl'."""

    betas: np.ndarray
    mean_type: str = "epsilon"
    var_type: str = "learned_range"
    loss_type: str = "mse"
    timestep_map: np.ndarray | None = None  # respaced -> base timesteps
    self_condition: bool = False

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        sched = {
            "betas": betas,
            "alphas_cumprod": acp,
            "sqrt_acp": np.sqrt(acp),
            "sqrt_om_acp": np.sqrt(1.0 - acp),
            "sqrt_recip_acp": np.sqrt(1.0 / acp),
            "sqrt_recipm1_acp": np.sqrt(1.0 / acp - 1.0),
            "posterior_variance": post_var,
            "posterior_log_var_clipped": np.log(np.append(post_var[1], post_var[1:])),
            "posterior_mean_c1": betas * np.sqrt(acp_prev) / (1.0 - acp),
            "posterior_mean_c2": (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp),
            "log_betas": np.log(betas),
            "alphas_cumprod_prev": acp_prev,
        }
        object.__setattr__(self, "_sched",
                           {k: jnp.asarray(v, jnp.float32) for k, v in sched.items()})
        if self.timestep_map is not None:
            object.__setattr__(self, "_tmap", jnp.asarray(self.timestep_map, jnp.int32))
        else:
            object.__setattr__(self, "_tmap", None)

    @property
    def num_timesteps(self):
        return len(self.betas)

    def _extract(self, key, t, ndim):
        v = self._sched[key][t]
        return v.reshape(v.shape + (1,) * (ndim - 1))

    def map_t(self, t):
        """Respaced scan index -> base-model timestep."""
        return t if self._tmap is None else self._tmap[t]

    # ---------------- q process
    def q_sample(self, x_start, t, noise):
        nd = x_start.ndim
        return (self._extract("sqrt_acp", t, nd) * x_start
                + self._extract("sqrt_om_acp", t, nd) * noise)

    def q_posterior(self, x_start, x_t, t):
        nd = x_t.ndim
        mean = (self._extract("posterior_mean_c1", t, nd) * x_start
                + self._extract("posterior_mean_c2", t, nd) * x_t)
        var = self._extract("posterior_variance", t, nd)
        log_var = self._extract("posterior_log_var_clipped", t, nd)
        return mean, var, log_var

    def _predict_xstart_from_eps(self, x_t, t, eps):
        nd = x_t.ndim
        return (self._extract("sqrt_recip_acp", t, nd) * x_t
                - self._extract("sqrt_recipm1_acp", t, nd) * eps)

    def _predict_eps_from_xstart(self, x_t, t, x_start):
        nd = x_t.ndim
        return ((self._extract("sqrt_recip_acp", t, nd) * x_t - x_start)
                / self._extract("sqrt_recipm1_acp", t, nd))

    # ---------------- p process
    def p_mean_variance(self, model_output, x, t, clip_denoised=False):
        """model_output: [B, ..., C or 2C]. Returns dict of mean/log_var/
        pred_xstart."""
        C = x.shape[-1]
        nd = x.ndim
        if self.var_type == "learned_range":
            model_output, var_values = jnp.split(model_output, 2, axis=-1)
            min_log = self._extract("posterior_log_var_clipped", t, nd)
            max_log = self._extract("log_betas", t, nd)
            frac = (var_values + 1) / 2
            model_log_var = frac * max_log + (1 - frac) * min_log
        elif self.var_type == "fixed_small":
            model_log_var = jnp.broadcast_to(
                self._extract("posterior_log_var_clipped", t, nd), x.shape)
        else:  # fixed_large
            betas = self._sched["betas"]
            var = jnp.concatenate([self._sched["posterior_variance"][1:2], betas[1:]])
            model_log_var = jnp.broadcast_to(jnp.log(var)[t].reshape((-1,) + (1,) * (nd - 1)), x.shape)

        if self.mean_type == "xstart":
            pred_xstart = model_output
        else:
            pred_xstart = self._predict_xstart_from_eps(x, t, model_output)
        if clip_denoised:
            pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)
        if C == 2:  # angle data
            pred_xstart = _wrap_pm1(pred_xstart)

        mean, _, _ = self.q_posterior(pred_xstart, x, t)
        return {"mean": mean, "log_variance": model_log_var, "pred_xstart": pred_xstart}

    def p_sample(self, rng, model_fn, x, t_idx, clip_denoised=False,
                 x_self_cond=None):
        """One ancestral step x_t -> x_{t-1}. t_idx: scalar respaced index.
        Returns (sample, pred_xstart)."""
        B = x.shape[0]
        t = jnp.full((B,), t_idx, jnp.int32)
        k_model, k_noise = jax.random.split(rng)
        if self.self_condition:
            model_out = model_fn(x, self.map_t(t), k_model, x_self_cond=x_self_cond)
        else:
            model_out = model_fn(x, self.map_t(t), k_model)
        out = self.p_mean_variance(model_out, x, t, clip_denoised)
        z = jax.random.normal(k_noise, x.shape)
        nonzero = (t_idx != 0).astype(x.dtype)
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * z
        if x.shape[-1] == 2:
            sample = _wrap_pm1(sample)
        return sample, out["pred_xstart"]

    def p_sample_loop_host(self, rng, model_fn, shape, noise=None,
                           clip_denoised=False, jit_step=True):
        """Host-side loop over a jitted single step: identical math to
        `p_sample_loop`, but only the step body compiles (a 100x smaller
        XLA program — dispatch overhead is negligible vs step cost)."""
        if noise is None:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, shape)

        if self.self_condition:
            def step(rng, x, t_idx, x_start):
                return self.p_sample(rng, model_fn, x, t_idx, clip_denoised,
                                     x_self_cond=x_start)
        else:
            def step(rng, x, t_idx, _):
                return self.p_sample(rng, model_fn, x, t_idx, clip_denoised)
        if jit_step:
            step = jax.jit(step)

        x, x_start = noise, jnp.zeros_like(noise)
        for t_idx in reversed(range(self.num_timesteps)):
            rng, sub = jax.random.split(rng)
            x, x_start = step(sub, x, jnp.int32(t_idx), x_start)
        return x

    def p_sample_loop(self, rng, model_fn, shape, noise=None, clip_denoised=False,
                      progress=False):
        """Full ancestral sampling as one lax.scan (jit-able end to end).

        model_fn(x, t_base, rng) -> [B, ..., C*(1 or 2)].
        """
        if noise is None:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, shape)
        T = self.num_timesteps

        def step(carry, i):
            x, rng, x_start_prev = carry
            rng, sub = jax.random.split(rng)
            sample, x_start = self.p_sample(
                sub, model_fn, x, T - 1 - i, clip_denoised,
                x_self_cond=x_start_prev if self.self_condition else None)
            return (sample, rng, x_start), None

        carry = (noise, rng, jnp.zeros_like(noise))
        (x, _, _), _ = jax.lax.scan(step, carry, jnp.arange(T))
        return x

    # ---------------- DDIM (deterministic sampler; framework extension —
    # the reference only has DDIM-STRIDE respacing of the ancestral
    # sampler, respace.py:20-33, no ddim_sample. eta follows Song et al.:
    # eta=0 is the deterministic probability-flow step, eta=1 recovers the
    # ancestral fixed-small posterior step.)
    def ddim_sample(self, model_fn, x, t_idx, rng=None, eta=0.0,
                    clip_denoised=False, x_self_cond=None):
        """One DDIM step x_t -> x_{t-1} (respaced indices). Returns
        (sample, pred_xstart). rng may be None when eta == 0."""
        B = x.shape[0]
        nd = x.ndim
        t = jnp.full((B,), t_idx, jnp.int32)
        if rng is None:
            k_model = k_noise = jax.random.PRNGKey(0)
        else:
            k_model, k_noise = jax.random.split(rng)
        if self.self_condition:
            model_out = model_fn(x, self.map_t(t), k_model,
                                 x_self_cond=x_self_cond)
        else:
            model_out = model_fn(x, self.map_t(t), k_model)
        out = self.p_mean_variance(model_out, x, t, clip_denoised)
        pred_xstart = out["pred_xstart"]
        eps = self._predict_eps_from_xstart(x, t, pred_xstart)

        acp = self._extract("alphas_cumprod", t, nd)
        acp_prev = self._extract("alphas_cumprod_prev", t, nd)
        sigma = (eta * jnp.sqrt((1.0 - acp_prev) / (1.0 - acp))
                 * jnp.sqrt(1.0 - acp / acp_prev))
        mean = (jnp.sqrt(acp_prev) * pred_xstart
                + jnp.sqrt(jnp.maximum(1.0 - acp_prev - sigma**2, 0.0)) * eps)
        nonzero = (t_idx != 0).astype(x.dtype)
        if eta == 0.0:
            sample = mean
        else:
            z = jax.random.normal(k_noise, x.shape)
            sample = mean + nonzero * sigma * z
        if x.shape[-1] == 2:
            sample = _wrap_pm1(sample)
        return sample, pred_xstart

    def ddim_sample_loop(self, rng, model_fn, shape, noise=None, eta=0.0,
                         clip_denoised=False):
        """Full DDIM sampling as one lax.scan (mirrors p_sample_loop)."""
        if noise is None:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, shape)
        T = self.num_timesteps

        def step(carry, i):
            x, rng, x_start_prev = carry
            rng, sub = jax.random.split(rng)
            sample, x_start = self.ddim_sample(
                model_fn, x, T - 1 - i, rng=sub, eta=eta,
                clip_denoised=clip_denoised,
                x_self_cond=x_start_prev if self.self_condition else None)
            return (sample, rng, x_start), None

        carry = (noise, rng, jnp.zeros_like(noise))
        (x, _, _), _ = jax.lax.scan(step, carry, jnp.arange(T))
        return x

    # ---------------- losses
    def _vb_terms(self, frozen_out, x_start, x_t, t, mask=None):
        true_mean, _, true_log_var = self.q_posterior(x_start, x_t, t)
        out = self.p_mean_variance(frozen_out, x_t, t, clip_denoised=False)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl, mask) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"])
        decoder_nll = mean_flat(decoder_nll, mask) / np.log(2.0)
        return jnp.where(t == 0, decoder_nll, kl)

    def training_losses(self, rng, model_fn, x_start, t, mask=None, noise=None):
        """t: [B] respaced indices. mask: [B, L, 1]-broadcastable or None.
        Returns dict with 'loss', 'mse' (and 'vb')."""
        if noise is None:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, x_start.shape)
        if x_start.shape[-1] == 2:
            noise = _wrap_pm1(noise)
        x_t = self.q_sample(x_start, t, noise)
        if x_t.shape[-1] == 2:
            x_t = _wrap_pm1(x_t)

        rng, k_model = jax.random.split(rng)
        if self.self_condition:
            # 50% of steps: predict x_start once (no grad) and feed it back
            # (reference gaussian_diffusion.py:627-634)
            rng, k_sc, k_flag = jax.random.split(rng, 3)

            def _make_sc(_):
                out0 = model_fn(x_t, self.map_t(t), k_sc,
                                x_self_cond=jnp.zeros_like(x_t))
                pred = self.p_mean_variance(out0, x_t, t,
                                            clip_denoised=False)["pred_xstart"]
                return jax.lax.stop_gradient(pred)

            x_self_cond = jax.lax.cond(
                jax.random.bernoulli(k_flag), _make_sc,
                lambda _: jnp.zeros_like(x_t), operand=None)
            model_output = model_fn(x_t, self.map_t(t), k_model,
                                    x_self_cond=x_self_cond)
        else:
            model_output = model_fn(x_t, self.map_t(t), k_model)

        terms = {}
        if self.var_type == "learned_range":
            C = x_t.shape[-1]
            mean_out, var_values = jnp.split(model_output, 2, axis=-1)
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(mean_out), var_values], axis=-1)
            terms["vb"] = self._vb_terms(frozen, x_start, x_t, t, mask)
            if self.loss_type == "rescaled_mse":
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)
            model_output = mean_out

        target = {"epsilon": noise, "xstart": x_start}[self.mean_type]
        diff = target - model_output
        if target.shape[-1] == 2:
            diff = _wrap_pm1(diff)
        terms["mse"] = mean_flat(diff**2, mask)
        terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
        return terms


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Discretized Gaussian NLL (1/255 bins, iDDPM convention; reference
    diffusion_and_flow/diffusion_utils.py:62-88)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus, jnp.log(jnp.maximum(cdf_delta, 1e-12))))


def diffusion_from_tmap(tmap, noise_schedule="linear", diffusion_steps=1000,
                        learn_sigma=True, predict_xstart=False,
                        self_condition=False):
    """Rebuild a respaced GaussianDiffusion from an explicit base-timestep
    list (ascending).  Used to reconstruct a progressively-distilled
    student's exact sampling grid at eval time (gen/distill.py stores the
    student's timestep_map in its checkpoint config — the grid is
    teacher_grid[0::2]^k and matches no standard respacing string)."""
    tmap = np.asarray(sorted(int(t) for t in tmap))
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    acp = np.cumprod(1.0 - betas)
    last = 1.0
    new_betas = []
    for i in tmap:
        new_betas.append(1.0 - acp[i] / last)
        last = acp[i]
    return GaussianDiffusion(
        betas=np.asarray(new_betas),
        mean_type="xstart" if predict_xstart else "epsilon",
        var_type="learned_range" if learn_sigma else "fixed_small",
        loss_type="mse",
        timestep_map=tmap,
        self_condition=self_condition,
    )


def create_diffusion(timestep_respacing=None, noise_schedule="linear",
                     use_kl=False, rescale_learned_sigmas=False,
                     sigma_small=False, predict_xstart=False, learn_sigma=True,
                     diffusion_steps=1000, self_condition=False):
    """Factory matching the reference defaults (reference
    diffusion_and_flow/__init__.py:10-60)."""
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = [diffusion_steps]
    use_steps = space_timesteps(diffusion_steps, timestep_respacing)

    # respace: keep selected steps, rebuild betas from their alpha_cumprod
    acp = np.cumprod(1.0 - betas)
    last = 1.0
    new_betas, tmap = [], []
    for i, a in enumerate(acp):
        if i in use_steps:
            new_betas.append(1 - a / last)
            last = a
            tmap.append(i)

    if use_kl:
        loss_type = "kl"
    elif rescale_learned_sigmas:
        loss_type = "rescaled_mse"
    else:
        loss_type = "mse"
    return GaussianDiffusion(
        betas=np.array(new_betas),
        mean_type="xstart" if predict_xstart else "epsilon",
        var_type=("learned_range" if learn_sigma
                  else ("fixed_small" if sigma_small else "fixed_large")),
        loss_type=loss_type,
        timestep_map=np.array(tmap),
        self_condition=self_condition,
    )
