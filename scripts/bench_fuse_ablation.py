"""Headline-perf ablation: sampling scan with fuse_pairs ON vs OFF
(VERDICT r5 item 4 — the round-4 layer-pair fusion, kernels/mpnn_kernels.py
fused_edge_then_sum, landed without an uncontended headline measurement;
rounds 3->4 read 130.4 -> 123.7 steps/s but round 4 blamed chip contention.
This times BOTH paths in one process on an idle chip so the fusion's actual
effect is isolated from run-to-run/tunnel variance).

Usage: python scripts/bench_fuse_ablation.py [repeats]
Prints one JSON line: steps/sec/chip for each path + the ratio.
"""

import json
import sys
import time

import numpy as np


B, L, DENOISE_STEPS = 96, 128, 100


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from codlad_tpu.gen.diffusion import create_diffusion
    from codlad_tpu.models.denoiser import MPNNDenoiser, mpnn_diffusion

    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    rng = np.random.default_rng(0)
    res_type = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
    steps = rng.normal(size=(B, L, 3))
    steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
    cg = jnp.asarray(np.cumsum(3.8 * steps, axis=1).astype(np.float32))
    mask = jnp.ones((B, L), dtype=bool)

    model = mpnn_diffusion(input_size=3, learn_sigma=True, dropout=0.0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 3)),
        jnp.zeros((1,), jnp.int32), res_type[:1, :16], cg[:1, :16],
        mask[:1, :16])
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

    def make_scan(fuse):
        def _scan(rng, p, c):
            rng, sub = jax.random.split(rng)
            x = jax.random.normal(sub, (B, L, 3))

            def model_fn(x, t, rng, x_self_cond=None):
                out = model.apply(p, x.astype(jnp.bfloat16), t, c,
                                  deterministic=True, fuse_pairs=fuse,
                                  method=MPNNDenoiser.denoise)
                return out.astype(jnp.float32)

            return diffusion.p_sample_loop(rng, model_fn, x.shape, noise=x)

        return jax.jit(_scan).lower(jax.random.PRNGKey(0), params, cond).compile()

    out = {}
    for fuse in (True, False):
        name = "fuse_on" if fuse else "fuse_off"
        t0 = time.monotonic()
        compiled = make_scan(fuse)
        print(f"[{name}] compile {time.monotonic() - t0:.1f}s",
              file=sys.stderr, flush=True)
        compiled(jax.random.PRNGKey(0), params, cond).block_until_ready()
        times = []
        for i in range(repeats):
            t0 = time.perf_counter()
            compiled(jax.random.PRNGKey(i + 1), params, cond).block_until_ready()
            times.append(time.perf_counter() - t0)
        sps = DENOISE_STEPS / min(times) / jax.device_count()
        out[name] = round(sps, 3)
        out[name + "_all_times_ms"] = [round(t * 1e3, 1) for t in times]

    out["fuse_speedup"] = round(out["fuse_on"] / out["fuse_off"], 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
