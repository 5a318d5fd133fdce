"""Profile the Stage-2 latent-diffusion train step on the attached
accelerator (companion of prof_stage1.py; docs/DESIGN.md §10-13).

Times the jitted `make_latent_step` train step at the PED recipe shape
(batch 128, L=128, k=64, hidden 128, latent 3 — reference
train_latent.py:416-463), with dropout ACTIVE (the training path the
fused keep-mask kernels serve), optionally capturing a device trace.

    python scripts/prof_stage2.py                    # bf16 timing
    python scripts/prof_stage2.py --dtype float32
    python scripts/prof_stage2.py --dropout 0.0      # inference-path kernels
    python scripts/prof_stage2.py --trace /tmp/s2trace
    python scripts/parse_xplane.py /tmp/s2trace 30

Timing caveats on the axon-tunneled TPU: repeated identical dispatches
are memoized by the remote executor, so every iteration folds a fresh
rng; host wall-clock includes ~60 ms/step of tunnel dispatch overhead —
the device trace is the ground truth.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--length", type=int, default=128)
    ap.add_argument("--latent", type=int, default=3)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--fast_rng", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler device trace")
    ap.add_argument("--scan", type=int, default=0,
                    help="run N steps inside ONE jitted lax.scan dispatch "
                         "(device-honest timing: the host-loop number "
                         "carries +-12%% of axon tunnel noise)")
    args = ap.parse_args()

    import jax
    if args.fast_rng:
        jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from codlad_tpu.gen.diffusion import create_diffusion
    from codlad_tpu.models.denoiser import mpnn_diffusion
    from codlad_tpu.train.state import create_train_state
    from codlad_tpu.train.steps import make_latent_step

    B, L = args.batch, args.length
    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(0)
    x1 = jnp.asarray(nprng.normal(size=(B, L, args.latent)).astype(np.float32))
    extras = {
        "res_type": jnp.asarray(nprng.integers(0, 20, size=(B, L))),
        "cg_xyz": jnp.asarray(
            np.cumsum(nprng.normal(scale=2.0, size=(B, L, 3)), axis=1)
            .astype(np.float32)),
        "mask": jnp.ones((B, L), jnp.float32),
    }

    denoiser = mpnn_diffusion(input_size=args.latent, dropout=args.dropout)
    process = create_diffusion(None, diffusion_steps=1000)
    params = jax.jit(denoiser.init)(
        rng, x1, jnp.zeros((B,), jnp.int32),
        extras["res_type"], extras["cg_xyz"], extras["mask"])
    state = create_train_state(params, optax.adamw(3e-4), with_ema=True)
    train_step, _ = make_latent_step(
        denoiser, process, process_kind="diffusion",
        dropout=args.dropout > 0,
        compute_dtype=None if args.dtype == "float32" else args.dtype)

    state, m = train_step(state, x1, extras, rng)
    _ = float(m["loss"])  # compile + warm

    if args.scan:
        # N steps in one dispatch: rng chains per step, so nothing is
        # memoizable and the measured time is the device's
        @jax.jit
        def many(state, x1, extras, rngs):
            def body(st, r):
                st2, mm = train_step(st, x1, extras, r)
                return st2, mm["loss"]
            return jax.lax.scan(body, state, rngs)

        rngs = jax.random.split(jax.random.fold_in(rng, 7), args.scan)
        st2, losses = many(state, x1, extras, rngs)
        _ = float(losses[-1])  # compile + warm
        t0 = time.perf_counter()
        st2, losses = many(state, x1, extras,
                           jax.random.split(jax.random.fold_in(rng, 8),
                                            args.scan))
        _ = float(losses[-1])
        dt = (time.perf_counter() - t0) / args.scan
        print(f"{args.dtype} dropout={args.dropout} scan-step: "
              f"{dt * 1e3:.1f} ms ({jax.devices()[0].device_kind})")
        return

    if args.trace:
        jax.profiler.start_trace(args.trace)
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, m = train_step(state, x1, extras, jax.random.fold_in(rng, i))
    _ = float(m["loss"])  # host sync
    dt = (time.perf_counter() - t0) / args.iters
    if args.trace:
        jax.profiler.stop_trace()
        print(f"trace -> {args.trace}")
    print(f"{args.dtype} dropout={args.dropout} step: {dt * 1e3:.1f} ms "
          f"({jax.devices()[0].device_kind})")


if __name__ == "__main__":
    main()
