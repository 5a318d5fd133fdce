"""Headline benchmark: Stage-2 denoise throughput on the PED eval workload.

Metric: denoiser evaluations (denoise steps) per second per chip at the
reference evaluation shape — 100-step DDIM-spaced ensemble sampling over a
PED-sized batch (96 frames x 128 residues, k=64 neighbors, hidden 128,
latent 3; reference recipe README.md:144-155, batch test.py bs<=96).

The sampled latents go through the full fused pipeline (scan over 100
denoiser evals compiled as ONE XLA program); we report the denoise-step
rate, which dominates end-to-end sampling cost.

`vs_baseline` compares against an ESTIMATED reference throughput on A100 of
10 denoise steps/sec for the same workload (no numbers are published by the
reference; estimate from a FLOP model: ~2.3e12 FLOP per doubled-batch
denoise step at ~35-40% TF32 utilization incl. per-step launch overhead of
the torch Python loop). The driver's north-star target is 5x => vs_baseline
>= 5.

DRIVER BUDGET CONTRACT (VERDICT r4 weak #1: BENCH_r04 was rc=124 with no
JSON because six sections each paid fresh multi-minute compiles through
the remote-TPU tunnel and the JSON printed only at the very end):
  * the headline JSON line is printed and FLUSHED as soon as the headline
    number exists — an external kill after that point still leaves a
    parseable record on stdout;
  * every extra section runs under a wall-clock budget (BENCH_BUDGET_S,
    default 270 s): a section whose estimated cost exceeds the remaining
    budget is recorded as "skipped(budget)" instead of running;
  * the FINAL JSON line (the one the driver should parse: last line of
    stdout) repeats the headline with whatever extras completed;
  * compiles persist across runs via the JAX compilation cache
    (/tmp/jax_bench_cache), so a warm rerun is seconds, and the headline
    scan's compile is REUSED for the MFU cost analysis instead of
    lowering a second program.
Measured wall time on the idle tunneled v5e chip (2026-08-20): cold
~210 s with every section present, warm rerun ~55 s.

The JSON line carries `extra_metrics` grounding the claim beyond the
estimated baseline:
  * `e2e_structures_per_sec_per_chip`: FULL sample->structure pipeline
    (100 denoise steps + VQ snap + IC decode + ic_to_xyz14 Cartesian
    rebuild) — the reference's whole test.py:481-582 inner loop;
  * `e2e_mixed_structures_per_sec_per_chip`: the same pipeline over a
    MIXED workload of three protein lengths/buckets with distinct CA
    traces and per-bucket edge counts (the eval harness's real shape;
    the homogeneous number sees a single compilation bucket);
  * `denoise_mfu`: measured denoise FLOPs over the chip's peak bf16
    FLOPs.  The FLOP numerator comes from XLA cost analysis of the
    compiled 100-step sampling scan divided by the step count (WITH the
    Pallas kernels' pl.CostEstimate included — round 2 reported 1.85%
    because pallas_call scored 0 FLOPs without estimates).
  * `useful_mfu`: denoise_mfu with the one-hot selection FLOPs EXCLUDED
    from the numerator (the gather contractions are bookkeeping, not
    model math: n_chains * 2*B*L*K*L*H FLOPs, one [TE, L] @ [L, H]
    selection matmul per fused chain — 9 chains/step at this config).
  * `stage1_train_ms` / `stage1_mfu`: Stage-1 (VQ-VAE) train step at the
    FIXED profile shape B=4 frames x L=130 residues, bf16 feature path —
    the docs/DESIGN.md §12 shape, kept constant across rounds.
  * `stage2_train_ms`: Stage-2 (denoiser) train step at the FIXED shape
    B=96 x L=128, k=64, bf16 mixed precision — same workload as the
    headline metric, so train/sample efficiency stay comparable.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 10.0  # estimated reference A100 (see module docstring)

B = 96          # frames per batch (reference eval bs<=96)
L = 128         # residues (PED-scale)
DENOISE_STEPS = 100
REPEATS = 3
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 270))
_T0 = time.monotonic()


def _remaining():
    return BUDGET_S - (time.monotonic() - _T0)


def _status(msg):
    print(f"[bench +{time.monotonic() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _emit(result):
    print(json.dumps(result), flush=True)


def _section(extras, name, est_cost_s, fn):
    """Run one extra-metric section under the wall-clock budget."""
    if _remaining() < est_cost_s:
        _status(f"{name}: skipped (est {est_cost_s:.0f}s > "
                f"{_remaining():.0f}s remaining)")
        extras[name] = "skipped(budget)"
        return
    t0 = time.monotonic()
    try:
        extras[name] = fn()
        _status(f"{name}: {extras[name]} ({time.monotonic() - t0:.1f}s)")
    except Exception as e:  # a failed extra must never kill the headline
        _status(f"{name}: failed ({type(e).__name__}: {e})")
        extras[name] = f"failed({type(e).__name__})"


def main():
    import jax

    # persistent compile cache: the driver's run after a same-host builder
    # run (or a rerun) skips the multi-minute tunnel compiles entirely
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from codlad_tpu.gen.diffusion import create_diffusion
    from codlad_tpu.models.denoiser import MPNNDenoiser, mpnn_diffusion

    rng = np.random.default_rng(0)
    res_type = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
    steps = rng.normal(size=(B, L, 3))
    steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
    cg = jnp.asarray(np.cumsum(3.8 * steps, axis=1).astype(np.float32))
    mask = jnp.ones((B, L), dtype=bool)

    model = mpnn_diffusion(input_size=3, learn_sigma=True, dropout=0.0)
    # init at tiny shapes (params are batch/length independent; full-shape
    # init would eagerly execute the whole forward)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 3)),
                        jnp.zeros((1,), jnp.int32), res_type[:1, :16],
                        cg[:1, :16], mask[:1, :16])
    diffusion = create_diffusion(f"ddim{DENOISE_STEPS}", diffusion_steps=1000,
                                 learn_sigma=True)

    # hoist x-independent conditioning out of the scan; run the denoise body
    # in bf16 (schedule math stays f32)
    cond = jax.jit(lambda p, r, c, m: model.apply(
        p, r, c, m, method=MPNNDenoiser.compute_condition))(params, res_type, cg, mask)
    cast = lambda v: (v.astype(jnp.bfloat16)
                      if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
                      else v)
    cond_bf16 = jax.tree.map(cast, cond)
    params_bf16 = jax.tree.map(cast, params)

    # the PRODUCTION sampling path: all 100 denoise evals in one lax.scan,
    # ONE dispatch per ensemble draw.  A host loop over a jitted single
    # step measured up to ±12% run-to-run variance through the remote
    # dispatch tunnel (100 round trips/sample); the scan number is the
    # device's, not the tunnel's.
    # IMPORTANT: params/cond are ARGUMENTS, not closure captures — a
    # capture would inline hundreds of MB of constants into the XLA program.
    def _sample_scan(rng, p, c):
        rng, sub = jax.random.split(rng)
        x = jax.random.normal(sub, (B, L, 3))

        def model_fn(x, t, rng, x_self_cond=None):
            out = model.apply(p, x.astype(jnp.bfloat16), t, c,
                              deterministic=True, fuse_pairs=False,
                              method=MPNNDenoiser.denoise)
            return out.astype(jnp.float32)

        return diffusion.p_sample_loop(rng, model_fn, x.shape, noise=x)

    # ONE lower+compile serves the timed runs AND the MFU cost analysis
    _status("compiling 100-step sampling scan")
    compiled_scan = (jax.jit(_sample_scan)
                     .lower(jax.random.PRNGKey(0), params_bf16, cond_bf16)
                     .compile())
    _status("compile done")

    def sample(key):
        return compiled_scan(key, params_bf16, cond_bf16)

    out = sample(jax.random.PRNGKey(0))  # warmup
    out.block_until_ready()

    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        out = sample(jax.random.PRNGKey(i + 1))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)

    best = min(times)
    steps_per_sec = DENOISE_STEPS / best
    n_chips = jax.device_count()
    value = steps_per_sec / n_chips

    # ---- MFU from the ALREADY-compiled scan.  XLA cost analysis counts a
    # while/scan BODY ONCE (verified on this backend: a 10-iter scan of a
    # 512^3 matmul reports 2.687e8 flops = one body, not 2.7e9), so the
    # program's flop count IS the per-denoise-step count.
    mfu = useful_mfu = None
    try:
        cost = compiled_scan.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0))
        kind = jax.devices()[0].device_kind.lower()
        peaks = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12,
                 "v5p": 459e12, "v6e": 918e12}
        peak = next((v for k, v in peaks.items() if k in kind), 197e12)
        if flops_per_step > 0:
            mfu = flops_per_step * steps_per_sec / (peak * n_chips)
            # selection (one-hot gather) FLOPs excluded: one [TE, L] @
            # [L, H] matmul per fused chain (enc layers update h_V AND
            # h_E = 2 chains each, dec layers 1)
            n_chains = 2 * model.num_encoder_layers + model.num_decoder_layers
            K = min(model.k_neighbors, L)
            sel = n_chains * 2.0 * B * L * K * L * model.hidden_dim
            useful_mfu = mfu * max(flops_per_step - sel, 0.0) / flops_per_step
    except Exception:
        pass

    extras = {
        "e2e_structures_per_sec_per_chip": None,
        "e2e_mixed_structures_per_sec_per_chip": None,
        "denoise_mfu": round(mfu, 4) if mfu is not None else None,
        "useful_mfu": round(useful_mfu, 4) if useful_mfu is not None else None,
        "stage2_train_ms(B96,L128,bf16)": None,
        "stage1_train_ms(B4,L130,bf16)": None,
        "stage1_mfu": None,
    }
    result = {
        "metric": "denoise_steps_per_sec_per_chip_PED_eval(B96,L128,ddim100)",
        "value": round(value, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": round(value / BASELINE_STEPS_PER_SEC, 3),
        "extra_metrics": extras,
    }
    # headline secured: print + flush NOW so any later kill still leaves a
    # parseable line (the final line below supersedes it when reached)
    _emit(result)

    # ---- extras, cheapest-compile first, each under the budget.  The two
    # train-step numbers are round-tracked (VERDICT r5 item 3 requires
    # them), so they run before the e2e sections.
    def stage2():
        return _bench_stage2_train(model, diffusion, params, res_type, cg, mask)

    def stage1():
        ms, s1_mfu = _bench_stage1_train()
        extras["stage1_mfu"] = s1_mfu
        return ms

    _section(extras, "stage2_train_ms(B96,L128,bf16)", 60, stage2)
    _section(extras, "stage1_train_ms(B4,L130,bf16)", 90, stage1)
    _section(extras, "e2e_structures_per_sec_per_chip", 45,
             lambda: _bench_e2e(sample, rng_np=np.random.default_rng(1)))
    _section(extras, "e2e_mixed_structures_per_sec_per_chip", 120,
             lambda: _bench_e2e_mixed(model, diffusion, params_bf16,
                                      rng_np=np.random.default_rng(2)))

    # the line the driver parses: LAST line of stdout
    _emit(result)


def _time_chained(fn, state0, n=8, warmup=2):
    """Median step time over a CHAIN of dependent calls (state_{i+1} =
    fn(state_i)); the remote executor memoizes repeated identical
    dispatches, so unchained timing reads cache hits, not device time."""
    import jax

    st = state0
    for _ in range(warmup):
        st = fn(st)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    for _ in range(n):
        st = fn(st)
    jax.block_until_ready(st)
    return (time.perf_counter() - t0) / n * 1e3


def _bench_stage2_train(model, diffusion, params, res_type, cg, mask):
    """One full Stage-2 train step (fwd+bwd+adamw+EMA, bf16 mixed
    precision) at the headline workload shape B=96 x L=128."""
    import jax
    import optax

    from codlad_tpu.train.state import create_train_state
    from codlad_tpu.train.steps import make_latent_step

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
    state = create_train_state(params, tx, with_ema=True)
    train_step, _ = make_latent_step(model, diffusion,
                                     process_kind="diffusion",
                                     compute_dtype="bfloat16")
    x1 = jax.random.normal(jax.random.PRNGKey(7), (B, L, 3))
    extras = {"res_type": res_type, "cg_xyz": cg, "mask": mask}

    def step(carry):
        st, x, i = carry
        st, _ = train_step(st, x, extras, jax.random.fold_in(
            jax.random.PRNGKey(8), i))
        # chain x on the params so consecutive dispatches differ
        return (st, x, i + 1)

    ms = _time_chained(step, (state, x1, 0))
    return round(ms, 2)


def _bench_stage1_train():
    """One full Stage-1 (VQ-VAE) train step at the FIXED docs/DESIGN.md
    §12 profile shape: 4 frames x 130 residues (synthetic featurized
    batch, 65k-edge capacity bucket), bf16 feature path.  Returns
    (ms/step, measured MFU)."""
    import jax
    import jax.numpy as jnp
    import optax

    from codlad_tpu.data import batch as BM
    from codlad_tpu.data.synthetic import synthetic_examples
    from codlad_tpu.models.vae import VAE
    from codlad_tpu.models.vq import vq_init
    from codlad_tpu.train.losses import LossWeights
    from codlad_tpu.train.state import create_train_state
    from codlad_tpu.train.steps import make_vqvae_step, weights_to_array

    exs = synthetic_examples(4, 132, seed=0)
    spec = BM.quantize_spec(BM.spec_for(exs))
    hb = {k: jnp.asarray(v) for k, v in BM.collate(exs, spec).items()}

    vae = VAE(embed_dim=36, vqdim=3, mode="vqvae", dec_nconv=4, enc_nconv=3,
              compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    params = jax.jit(vae.init)(rng, hb)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.inject_hyperparams(optax.adamw)(learning_rate=1e-3))
    state = create_train_state(params, tx, vq_state=vq_init(rng, 512, 3))
    train_step, _ = make_vqvae_step(vae)
    w = weights_to_array(LossWeights(zeta=5.0, omega=3.0).dynamic(2, True))

    def step(carry):
        st, i = carry
        st, _ = train_step(st, hb, jax.random.fold_in(rng, i), w)
        return (st, i + 1)

    ms = _time_chained(step, (state, 0))

    mfu = None
    try:
        cost = (jax.jit(train_step)
                .lower(state, hb, rng, w).compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        kind = jax.devices()[0].device_kind.lower()
        peaks = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12,
                 "v5p": 459e12, "v6e": 918e12}
        peak = next((v for k, v in peaks.items() if k in kind), 197e12)
        if flops > 0:
            mfu = round(flops / (ms / 1e3) / peak, 4)
    except Exception:
        pass
    return round(ms, 2), mfu


def _bench_e2e(sample, rng_np):
    """Full sample->structure throughput (reference test.py:481-582 loop):
    structures/sec/chip for 100-step sampling + VQ snap + ICDecoder +
    ic_to_xyz14 at the production VAE config (embed 36, vqdim 3, 4096
    codes, 4 decoder convs)."""
    import jax
    import jax.numpy as jnp

    from codlad_tpu import native
    from codlad_tpu.geometry.internal import ic_to_xyz14
    from codlad_tpu.models.vae import VAE
    from codlad_tpu.models.vq import vq_init, vq_quantize

    rng = rng_np
    # one CA trace shared across the batch (conditioning equal; perf-only)
    steps_v = rng.normal(size=(L + 2, 3))
    steps_v /= np.linalg.norm(steps_v, axis=-1, keepdims=True)
    cg_og = np.cumsum(3.8 * steps_v, axis=0).astype(np.float32)
    pairs = native.radius_graph(cg_og[1:-1].astype(np.float64),
                                np.ones(L, np.uint8), 21.0)
    E = int(pairs.shape[0])
    batch = {
        "res_type": jnp.asarray(np.tile(rng.integers(0, 20, size=(1, L)),
                                        (B, 1)).astype(np.int32)),
        "res_mask": jnp.ones((B, L), bool),
        "cg_xyz_og": jnp.asarray(np.tile(cg_og[None], (B, 1, 1))),
        "cg_edges": jnp.asarray(np.tile(pairs[None], (B, 1, 1)).astype(np.int32)),
        "cg_edges_mask": jnp.ones((B, E), bool),
    }

    vae = VAE(embed_dim=36, vqdim=3, mode="vqvae", dec_nconv=4)
    small = {k: v[:1, :16] if v.ndim >= 2 else v for k, v in batch.items()}
    small["cg_xyz_og"] = batch["cg_xyz_og"][:1, :18]
    vae_params = vae.init(jax.random.PRNGKey(3), small,
                          jnp.zeros((1, 16, 3)), method=VAE.decode)
    vq_state = vq_init(jax.random.PRNGKey(4), 4096, 3)

    @jax.jit
    def decode(p, vq, b, lat):
        lat_q, _, _, _ = vq_quantize(vq, lat, b["res_mask"], train=False)
        ic = vae.apply(p, b, lat_q, method=VAE.decode)
        return ic_to_xyz14(b["cg_xyz_og"], ic, b["res_type"])

    def run(key):
        lat = sample(key)
        return decode(vae_params, vq_state, batch, lat)

    out = run(jax.random.PRNGKey(10))
    out.block_until_ready()
    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        out = run(jax.random.PRNGKey(11 + i))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    import jax as _jax
    return round(B / min(times) / _jax.device_count(), 3)


def _make_cond_and_batch(rng, L, Bsz):
    """Distinct CA trace + mixed residue types for one length bucket."""
    import jax.numpy as jnp

    from codlad_tpu import native

    steps_v = rng.normal(size=(L + 2, 3))
    steps_v /= np.linalg.norm(steps_v, axis=-1, keepdims=True)
    cg_og = np.cumsum(3.8 * steps_v, axis=0).astype(np.float32)
    pairs = native.radius_graph(cg_og[1:-1].astype(np.float64),
                                np.ones(L, np.uint8), 21.0)
    E = int(pairs.shape[0])
    batch = {
        "res_type": jnp.asarray(rng.integers(0, 20, size=(Bsz, L)).astype(np.int32)),
        "res_mask": jnp.ones((Bsz, L), bool),
        "cg_xyz_og": jnp.asarray(np.tile(cg_og[None], (Bsz, 1, 1))),
        "cg_edges": jnp.asarray(np.tile(pairs[None], (Bsz, 1, 1)).astype(np.int32)),
        "cg_edges_mask": jnp.ones((Bsz, E), bool),
    }
    return batch


def _bench_e2e_mixed(model, diffusion, params_bf16, rng_np):
    """Mixed-workload e2e: three length buckets with distinct conditioning
    through the full sample->decode pipeline (the eval harness's real
    shape mix — reference test.py:413-710 loops over proteins of many
    sizes).  Reports aggregate structures/sec/chip across the sweep; each
    bucket samples through the fused 100-step scan (one dispatch per
    draw)."""
    import functools

    import jax
    import jax.numpy as jnp

    from codlad_tpu.geometry.internal import ic_to_xyz14
    from codlad_tpu.models.denoiser import MPNNDenoiser
    from codlad_tpu.models.vae import VAE
    from codlad_tpu.models.vq import vq_init, vq_quantize

    lengths = (64, 96, 128)
    vae = VAE(embed_dim=36, vqdim=3, mode="vqvae", dec_nconv=4)
    vq_state = vq_init(jax.random.PRNGKey(4), 4096, 3)

    cast = lambda v: (v.astype(jnp.bfloat16)
                      if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
                      else v)

    @jax.jit
    def decode(p, vq, b, lat):
        lat_q, _, _, _ = vq_quantize(vq, lat, b["res_mask"], train=False)
        ic = vae.apply(p, b, lat_q, method=VAE.decode)
        return ic_to_xyz14(b["cg_xyz_og"], ic, b["res_type"])

    buckets = []
    vae_params = None
    for i, L in enumerate(lengths):
        batch = _make_cond_and_batch(rng_np, L, B)
        if vae_params is None:
            small = {k: v[:1, :16] if v.ndim >= 2 else v for k, v in batch.items()}
            small["cg_xyz_og"] = batch["cg_xyz_og"][:1, :18]
            vae_params = vae.init(jax.random.PRNGKey(3), small,
                                  jnp.zeros((1, 16, 3)), method=VAE.decode)
        cond = jax.jit(lambda p, r, c, m: model.apply(
            p, r, c, m, method=MPNNDenoiser.compute_condition))(
            params_bf16, batch["res_type"], batch["cg_xyz_og"][:, 1:-1],
            batch["res_mask"])
        buckets.append((L, batch, jax.tree.map(cast, cond)))

    @functools.partial(jax.jit, static_argnames=("L",))
    def sample_bucket(key, p, cond, L):
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, (B, L, 3))

        def model_fn(x, t, rng, x_self_cond=None):
            out = model.apply(p, x.astype(jnp.bfloat16), t, cond,
                              deterministic=True, fuse_pairs=False,
                              method=MPNNDenoiser.denoise)
            return out.astype(jnp.float32)

        return diffusion.p_sample_loop(key, model_fn, x.shape, noise=x)

    def run_bucket(key, L, batch, cond):
        x = sample_bucket(key, params_bf16, cond, L)
        return decode(vae_params, vq_state, batch, x)

    # warm up every bucket's compilations, then time the full sweep
    for i, (L, batch, cond) in enumerate(buckets):
        run_bucket(jax.random.PRNGKey(100 + i), L, batch, cond).block_until_ready()
    times = []
    for r in range(REPEATS):
        t0 = time.perf_counter()
        outs = [run_bucket(jax.random.PRNGKey(200 + 10 * r + i), L, batch, cond)
                for i, (L, batch, cond) in enumerate(buckets)]
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    import jax as _jax
    return round(len(lengths) * B / min(times) / _jax.device_count(), 3)


if __name__ == "__main__":
    main()
