"""Measured HBM-traffic roofline for the headline sampling scan.

Closes VERDICT r4 item 4's evidence requirement with the compiler's own
accounting instead of the round-3 hand projection: lowers the EXACT
bench headline program (B96/L128 ddim100 scan, fuse_pairs=False — the
post-ablation production configuration, see scripts/bench_fuse_ablation.py)
and reads `compiled.cost_analysis()` flops + bytes accessed. Every Pallas
kernel contributes its true `pl.CostEstimate(flops=..., bytes_accessed=...)`
(kernels/mpnn_kernels.py:357, kernels/tp_kernels.py:148), so the numbers
include the custom kernels, not just stock HLOs. XLA counts a scan body
ONCE on this backend (verified in bench.py:195-198), so program totals ARE
per-denoise-step totals.

    python scripts/roofline_sampling.py [--step_ms 7.69]

step_ms defaults to the round-5 uncontended measurement (769 ms / 100
steps, /tmp/bench_r5_full.log; BENCH_r05). Prints one JSON line:
flops/step, bytes/step, arithmetic intensity, achieved TFLOP/s and GB/s,
and their fractions of the v5e peaks (197 bf16 TFLOP/s, 819 GB/s HBM).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

B, L, DENOISE_STEPS = 96, 128, 100
PEAK_FLOPS, PEAK_BW = 197e12, 819e9


def build_compiled():
    import numpy as np
    import jax
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
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 3)),
                                 jnp.zeros((1,), jnp.int32), res_type[:1, :16],
                                 cg[:1, :16], mask[:1, :16])
    diffusion = create_diffusion(f"ddim{DENOISE_STEPS}", diffusion_steps=1000,
                                 learn_sigma=True)
    cond = jax.jit(lambda p, r, c, m: model.apply(
        p, r, c, m, method=MPNNDenoiser.compute_condition))(
            params, res_type, cg, mask)
    cast = lambda v: (v.astype(jnp.bfloat16)
                      if hasattr(v, "dtype")
                      and jnp.issubdtype(v.dtype, jnp.floating) else v)
    cond = jax.tree.map(cast, cond)
    params = jax.tree.map(cast, params)

    def _sample_scan(rng, p, c):
        rng, sub = jax.random.split(rng)
        x = jax.random.normal(sub, (B, L, 3))

        def model_fn(x, t, rng, x_self_cond=None):
            out = model.apply(p, x.astype(jnp.bfloat16), t, c,
                              deterministic=True, fuse_pairs=False,
                              method=MPNNDenoiser.denoise)
            return out.astype(jnp.float32)

        return diffusion.p_sample_loop(rng, model_fn, x.shape, noise=x)

    import jax.random as jrandom
    return (jax.jit(_sample_scan)
            .lower(jrandom.PRNGKey(0), params, cond).compile())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step_ms", type=float, default=7.69,
                    help="measured per-denoise-step ms (bench best/100)")
    args = ap.parse_args()

    compiled = build_compiled()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    t = args.step_ms / 1e3
    out = {
        "shape": f"B{B},L{L},ddim{DENOISE_STEPS},bf16,fuse_pairs=False",
        "flops_per_step": flops,
        "bytes_per_step": byts,
        "arith_intensity_flop_per_byte": round(flops / max(byts, 1.0), 2),
        "ridge_flop_per_byte_v5e": round(PEAK_FLOPS / PEAK_BW, 1),
        "step_ms": args.step_ms,
        "achieved_tflops": round(flops / t / 1e12, 2),
        "mxu_fraction": round(flops / t / PEAK_FLOPS, 4),
        "achieved_GBps": round(byts / t / 1e9, 1),
        "hbm_fraction": round(byts / t / PEAK_BW, 4),
        # per-operand breakdown when the backend exposes it
        "bytes_accessed_operands": {
            k: v for k, v in cost.items()
            if k.startswith("bytes accessed") and k != "bytes accessed"},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
