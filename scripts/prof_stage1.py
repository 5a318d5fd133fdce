"""Profile the Stage-1 VQ-VAE train step on the attached accelerator.

The round-3 perf work's measurement harness (docs/DESIGN.md §10-12):
times the jitted train step on a synthetic profile batch (dense radius
graphs — past the dense-one-hot cliff, so the Pallas edge/TP kernels are
on the hot path), optionally capturing a device trace to rank ops with
scripts/parse_xplane.py.

    python scripts/prof_stage1.py                    # bf16 timing
    python scripts/prof_stage1.py --dtype float32
    python scripts/prof_stage1.py --trace /tmp/vqtrace
    python scripts/parse_xplane.py /tmp/vqtrace 30   # rank device ops

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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--length", type=int, default=130)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler device trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from codlad_tpu.data import batch as BB
    from codlad_tpu.data.synthetic import synthetic_examples
    from codlad_tpu.models.vae import VAE
    from codlad_tpu.models.vq import vq_init
    from codlad_tpu.train.losses import LossWeights
    from codlad_tpu.train.state import create_train_state
    from codlad_tpu.train.steps import make_vqvae_step, weights_to_array

    exs = synthetic_examples(args.batch, args.length, seed=0)
    spec = BB.quantize_spec(BB.spec_for(exs))
    batch = {k: jnp.asarray(v) for k, v in BB.collate(exs, spec).items()}
    print("edge capacity:", batch["atom_edges"].shape)

    vae = VAE(embed_dim=36, vqdim=3, mode="vqvae", dec_nconv=4, enc_nconv=3,
              compute_dtype=args.dtype)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(vae.init)(rng, batch)
    state = create_train_state(params, optax.adam(1e-3),
                               vq_state=vq_init(rng, 4096, 3))
    train_step, _ = make_vqvae_step(vae)
    w = weights_to_array(LossWeights())

    state, m = train_step(state, batch, rng, w)
    _ = float(m["loss"])  # compile + warm

    if args.trace:
        jax.profiler.start_trace(args.trace)
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, m = train_step(state, batch, jax.random.fold_in(rng, i), w)
    _ = float(m["loss"])  # host sync
    dt = (time.perf_counter() - t0) / args.iters
    if args.trace:
        jax.profiler.stop_trace()
        print(f"trace -> {args.trace}")
    print(f"{args.dtype} step: {dt * 1e3:.1f} ms "
          f"({jax.devices()[0].device_kind})")


if __name__ == "__main__":
    main()
