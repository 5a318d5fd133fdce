"""Progressive distillation of a trained Stage-2 diffusion checkpoint.

Framework extension (the reference ships only the 100-step ancestral
sampler, test.py:533): each round trains a student — initialized from the
teacher — so ONE student DDIM step matches TWO teacher DDIM steps
(gen/distill.py), then halves again: 100 -> 50 -> 25 -> 13 -> ... steps.
The result multiplies end-to-end structures/sec at near-constant quality.

The output directory is a normal latent checkpoint: `cli.test` detects the
`distill_tmap` in its config, rebuilds the student's exact sampling grid,
and defaults to the DDIM sampler.

Usage:
  python -m codlad_tpu.cli.distill --teacher_ckpt results/latent \
      --feature_dir features --exp results/distill --stats_name PED_N6 \
      --start_steps 100 --rounds 3 --steps_per_round 20000 --batch_size 128
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", type=str, default="results/distill")
    p.add_argument("--teacher_ckpt", type=str, required=True,
                   help="a cli.train_latent experiment dir (model diffusion)")
    p.add_argument("--feature_dir", type=str, required=True)
    p.add_argument("--stats_name", type=str, default=None)
    p.add_argument("--stats_dir", type=str, default="datasets/miu_and_sigma")
    p.add_argument("--start_steps", type=int, default=100,
                   help="the teacher's sampling grid for round 1 (the "
                        "production eval respacing)")
    p.add_argument("--start_grid", type=str, default="ddim",
                   choices=["ddim", "sections"],
                   help="round-1 grid: ddim stride or the reference's "
                        "section respacing (test.py's str(N))")
    p.add_argument("--rounds", type=int, default=3,
                   help="halvings: 100 -> 50 -> 25 -> 13 with 3 rounds")
    p.add_argument("--steps_per_round", type=int, default=20000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=200)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--use_teacher_ema", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--bf16", action="store_true", default=False)
    p.add_argument("--fast_rng", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--log_step", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if args.fast_rng:
        jax.config.update("jax_default_prng_impl", "rbg")

    import jax.numpy as jnp
    import optax

    from codlad_tpu.cli.train_latent import FeatureDataset
    from codlad_tpu.data.norm import load_stats, normalize
    from codlad_tpu.data.prefetch import prefetch
    from codlad_tpu.gen.diffusion import create_diffusion
    from codlad_tpu.gen.distill import halve
    from codlad_tpu.models.denoiser import MPNN_MODELS
    from codlad_tpu.train import mesh as mesh_mod
    from codlad_tpu.train.checkpoints import CheckpointManager
    from codlad_tpu.train.logging_utils import create_logger
    from codlad_tpu.train.state import create_train_state, warmup_linear_schedule
    from codlad_tpu.train.steps import make_distill_step

    mesh_mod.maybe_init_distributed()
    is_main = mesh_mod.is_main_process()
    pidx, pcount = jax.process_index(), jax.process_count()
    logger = create_logger(args.exp, main=is_main)
    logger.info(f"args: {vars(args)}")

    n_dev = jax.device_count()
    mesh = mesh_mod.make_mesh(n_dev)
    if n_dev > 1:
        from codlad_tpu.kernels.mpnn_kernels import set_kernel_mesh
        set_kernel_mesh(mesh)
    local_dev = max(n_dev // pcount, 1)

    teacher_ckpt = CheckpointManager(args.teacher_ckpt)
    tcfg = teacher_ckpt.load_config()
    if tcfg.get("model", "diffusion") != "diffusion":
        raise SystemExit("distillation needs a diffusion teacher "
                         f"(teacher model: {tcfg.get('model')})")
    if tcfg.get("self_condition"):
        raise SystemExit("self-conditioned teachers are not supported yet")
    latent_size = tcfg.get("latent_size", 3)

    if args.stats_name:
        mean, std = load_stats(args.stats_dir, args.stats_name)
    else:
        mean = np.zeros(latent_size, np.float32)
        std = np.ones(latent_size, np.float32)

    if args.batch_size % pcount:
        raise SystemExit(f"--batch_size {args.batch_size} must divide by "
                         f"process count {pcount}")
    host_bs = args.batch_size // pcount
    data = FeatureDataset(args.feature_dir, host_bs, seed=args.seed,
                          process_index=pidx, process_count=pcount)

    model = MPNN_MODELS[tcfg.get("backbone", "mpnn_diffusion")](
        input_size=latent_size, learn_sigma=True, dropout=0.0,
        adaln_mode=tcfg.get("adaln_mode", "trunk"))

    first = next(iter(data))
    rng = jax.random.PRNGKey(args.seed)
    params = jax.jit(model.init)(
        rng, jnp.asarray(first["x1"]),
        jnp.zeros((first["x1"].shape[0],), jnp.int32),
        jnp.asarray(first["res_type"]), jnp.asarray(first["cg_xyz"]),
        jnp.asarray(first["mask"]))
    tstate = create_train_state(params, optax.identity(), with_ema=True)
    name = "best" if teacher_ckpt.exists("best") else "last"
    tstate = teacher_ckpt.restore(tstate, name)
    teacher_params = (tstate.ema_params if args.use_teacher_ema
                      else tstate.params)
    logger.info(f"teacher restored from {args.teacher_ckpt}/{name}")

    respacing = (f"ddim{args.start_steps}" if args.start_grid == "ddim"
                 else str(args.start_steps))
    teacher_diff = create_diffusion(
        respacing, noise_schedule=tcfg.get("noise_schedule", "linear"),
        diffusion_steps=tcfg.get("diffusion_steps", 1000), learn_sigma=True)

    ckpt = CheckpointManager(args.exp)
    step_total = 0

    def device_batches():
        for hb in data:
            x1 = normalize(hb.pop("x1"), mean, std,
                           norm_in=True).astype(np.float32)
            hb["x1"] = x1
            hb = mesh_mod.pad_batch_to_devices(hb, local_dev)
            sb = mesh_mod.shard_batch(hb, mesh)
            yield sb.pop("x1"), sb

    for rnd in range(args.rounds):
        student_diff = halve(teacher_diff)
        Ts = student_diff.num_timesteps
        logger.info(f"round {rnd + 1}/{args.rounds}: "
                    f"{teacher_diff.num_timesteps} -> {Ts} steps")

        sched = warmup_linear_schedule(args.lr, args.warmup,
                                       args.steps_per_round, args.lr * 0.1)
        tx = optax.chain(optax.clip_by_global_norm(args.grad_clip),
                         optax.adamw(sched, weight_decay=0.0))
        # Student starts as the teacher (same architecture, same weights) —
        # but from a COPY: from round 2 on, teacher_params is the previous
        # state.ema_params, an already-committed replicated Array, so
        # replicate() is a no-op returning the SAME buffers; train_step
        # donates the state, which would delete the teacher mid-round.
        state = create_train_state(jax.tree.map(jnp.copy, teacher_params),
                                   tx, with_ema=True)
        state = mesh_mod.replicate(state, mesh)
        teacher_rep = mesh_mod.replicate(teacher_params, mesh)

        train_step, _ = make_distill_step(
            model, teacher_diff, student_diff, ema_decay=args.ema_decay,
            compute_dtype="bfloat16" if args.bf16 else None)

        steps = 0
        log_t0, log_steps = time.time(), 0
        while steps < args.steps_per_round:
            for x1, sb in prefetch(device_batches()):
                key = jax.random.fold_in(jax.random.PRNGKey(args.seed),
                                         step_total)
                state, metrics = train_step(state, teacher_rep, x1, sb, key)
                steps += 1
                step_total += 1
                log_steps += 1
                if steps % args.log_step == 0:
                    dt = time.time() - log_t0
                    logger.info(
                        f"round {rnd + 1} step {steps}/"
                        f"{args.steps_per_round}: "
                        f"loss {float(metrics['loss']):.5f} "
                        f"mse {float(metrics['mse']):.6f} "
                        f"grad_norm {float(metrics['grad_norm']):.4f} "
                        f"steps/sec {log_steps / dt:.3f}")
                    log_t0, log_steps = time.time(), 0
                if steps >= args.steps_per_round:
                    break

        # the round's student is the next round's teacher (EMA weights,
        # like the paper's sampling-time weight choice)
        teacher_params = state.ema_params
        teacher_diff = student_diff
        cfg = dict(tcfg, distilled=True,
                   distill_tmap=[int(t) for t in
                                 np.asarray(student_diff.timestep_map)],
                   distill_round=rnd + 1, teacher_ckpt=args.teacher_ckpt,
                   model="diffusion")
        if is_main:
            ckpt.save_config(cfg)
        ckpt.save(state, f"T{Ts}")
        ckpt.save(state, "last")
        logger.info(f"round {rnd + 1} done: saved {args.exp}/T{Ts} "
                    f"({Ts}-step student)")

    logger.info("distillation done; evaluate with: python -m "
                f"codlad_tpu.cli.test --latent_ckpt {args.exp} "
                "(picks the DDIM sampler + the student's grid from config)")
    return state


if __name__ == "__main__":
    main()
