"""Stage-2 trainer CLI: latent diffusion / flow matching over extracted
features, data-parallel over all available chips.

Port of the reference DDP trainer (reference: train_latent.py:36-413):
AdamW with warmup->linear-decay LR, grad clip, EMA(0.9999), periodic +
best + last checkpoints, steps/sec logging — with Accelerate/NCCL replaced
by a jax Mesh: the global batch is sharded on the 'data' axis and XLA
reduces gradients over ICI.

Usage:
  python -m codlad_tpu.cli.train_latent --feature_dir features/train \
      --val_dir features/valid --exp results/latent --model diffusion \
      --latent_size 3 --stats_name PED_N6 --lr 3e-4 --warmup 80000 \
      --schedule_steps 1200000 --final_lr 1e-5 --batch_size 128
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", type=str, default="results/latent")
    p.add_argument("--feature_dir", type=str, required=True)
    p.add_argument("--val_dir", type=str, default=None)
    p.add_argument("--stats_name", type=str, default=None)
    p.add_argument("--stats_dir", type=str, default="datasets/miu_and_sigma")
    p.add_argument("--model", type=str, default="diffusion",
                   choices=["diffusion", "fm", "icfm", "vpfm", "otcfm",
                            "sbcfm", "backbone"])
    p.add_argument("--backbone", type=str, default="mpnn_diffusion")
    p.add_argument("--latent_size", type=int, default=3)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup", type=int, default=80000)
    p.add_argument("--schedule_steps", type=int, default=None)
    p.add_argument("--final_lr", type=float, default=None)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--noise_schedule", type=str, default="linear")
    p.add_argument("--predict_xstart", action="store_true", default=False)
    p.add_argument("--self_condition", action="store_true", default=False)
    p.add_argument("--save_step", type=int, default=5000)
    p.add_argument("--log_step", type=int, default=100)
    p.add_argument("--val_every_epochs", type=int, default=1,
                   help="run validation every N epochs")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true", default=False)
    p.add_argument("--model_ckpt", type=str, default=None,
                   help="warm-start weights from this checkpoint dir (no optimizer/step)")
    p.add_argument("--dropout", type=float, default=0.6)
    p.add_argument("--bf16", action="store_true", default=False,
                   help="mixed-precision training: bf16 network forward "
                        "over f32 master params (diffusion math stays f32)")
    p.add_argument("--adaln_mode", type=str, default="trunk",
                   choices=["trunk", "residual"],
                   help="'trunk' reproduces the reference adaLN (zero-init "
                        "gates scale the whole trunk, protein_mpnn_utils.py:"
                        "249,270); 'residual' is DiT-style branch gating — "
                        "identity at init, a training-efficiency variant")
    p.add_argument("--t_sampler", type=str, default="uniform",
                   choices=["uniform", "loss_second_moment"],
                   help="diffusion timestep schedule sampler (the reference "
                        "ships LossSecondMomentResampler unwired; here it works)")
    return p


class FeatureDataset:
    """Batches of normalized latents + conditioning from extract_features
    output (reference CustomDataset + latent_collate_fn,
    utils/dataset_module.py:382-490)."""

    def __init__(self, directory, batch_size, seed=0, shuffle=True):
        self.directory = directory
        self.files = sorted(f for f in os.listdir(directory)
                            if f.endswith(".npz") and f != "manifest.npz")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        files = list(self.files)
        if self.shuffle:
            self._rng.shuffle(files)
        from codlad_tpu.data.shards import iter_padded_batches

        for fname in files:
            z = np.load(os.path.join(self.directory, fname))
            n = z["latents"].shape[0]
            idx = np.arange(n)
            if self.shuffle:
                self._rng.shuffle(idx)
            data = {
                "x1": z["latents"],
                "res_type": z["res_type"],
                "cg_xyz": z["cg_xyz_og"][:, 1:-1],
                "mask": z["res_mask"],
            }
            yield from iter_padded_batches(data, self.batch_size, idx)


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from codlad_tpu.data.norm import load_stats, normalize
    from codlad_tpu.gen.diffusion import create_diffusion
    from codlad_tpu.gen.flow import FLOW_MATCHERS
    from codlad_tpu.models.denoiser import MPNN_MODELS
    from codlad_tpu.train import mesh as mesh_mod
    from codlad_tpu.train.checkpoints import CheckpointManager
    from codlad_tpu.train.logging_utils import create_logger
    from codlad_tpu.train.state import create_train_state, warmup_linear_schedule
    from codlad_tpu.train.steps import make_latent_step

    logger = create_logger(args.exp)
    from codlad_tpu.train.logging_utils import MetricsSink
    sink = MetricsSink(args.exp, run_name=os.path.basename(args.exp),
                       config=vars(args))
    ckpt = CheckpointManager(args.exp)
    ckpt.save_config(vars(args))
    logger.info(f"args: {vars(args)}")

    mesh_mod.maybe_init_distributed()
    n_dev = jax.device_count()
    mesh = mesh_mod.make_mesh(n_dev)
    logger.info(f"data-parallel over {n_dev} device(s), "
                f"process {jax.process_index()}/{jax.process_count()}")

    if args.stats_name:
        mean, std = load_stats(args.stats_dir, args.stats_name)
    else:
        mean, std = np.zeros(args.latent_size, np.float32), np.ones(args.latent_size, np.float32)

    data = FeatureDataset(args.feature_dir, args.batch_size, seed=args.seed)
    val = FeatureDataset(args.val_dir or args.feature_dir, 4, shuffle=False)

    # model: sbcfm needs velocity + score head (2x); diffusion needs
    # mean + learned-range variance (2x)
    learn_sigma = args.model in ("diffusion", "sbcfm")
    model = MPNN_MODELS[args.backbone](
        input_size=args.latent_size, learn_sigma=learn_sigma,
        self_condition=args.self_condition, dropout=args.dropout,
        adaln_mode=args.adaln_mode)

    first = next(iter(val))
    rng = jax.random.PRNGKey(args.seed)
    params = jax.jit(model.init)(
        rng, jnp.asarray(first["x1"]), jnp.zeros((first["x1"].shape[0],), jnp.int32),
        jnp.asarray(first["res_type"]), jnp.asarray(first["cg_xyz"]),
        jnp.asarray(first["mask"]))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info(f"model parameters: {n_params:,}")

    sched = warmup_linear_schedule(args.lr, args.warmup, args.schedule_steps,
                                   args.final_lr)
    tx = optax.chain(optax.clip_by_global_norm(args.grad_clip),
                     optax.adamw(sched, weight_decay=0.0))
    state = create_train_state(params, tx, with_ema=True)

    if args.model == "diffusion":
        process = create_diffusion(None, noise_schedule=args.noise_schedule,
                                   predict_xstart=args.predict_xstart,
                                   learn_sigma=True,
                                   diffusion_steps=args.diffusion_steps,
                                   self_condition=args.self_condition)
    elif args.model == "backbone":
        process = None
    else:
        process = FLOW_MATCHERS[args.model]()
    train_step, eval_step = make_latent_step(
        model, process, process_kind=args.model, ema_decay=args.ema_decay,
        dropout=args.dropout > 0,
        compute_dtype="bfloat16" if args.bf16 else None)

    resampler = None
    if args.model == "diffusion" and args.t_sampler == "loss_second_moment":
        from codlad_tpu.gen.timestep_sampler import LossSecondMomentResampler
        resampler = LossSecondMomentResampler(args.diffusion_steps)

    if args.resume and ckpt.exists("last"):
        state = ckpt.restore(state, "last")
        logger.info(f"resumed at step {int(state.step)}")
    elif args.model_ckpt:
        warm = CheckpointManager(args.model_ckpt)
        name = "best" if warm.exists("best") else "last"
        loaded = warm.restore(state, name, load_opt=False)
        state = state.replace(params=loaded.params, ema_params=loaded.ema_params)
        logger.info(f"warm-started weights from {args.model_ckpt}/{name}")
    state = mesh_mod.replicate(state, mesh)

    train_steps = int(state.step)
    log_t0, log_steps = time.time(), 0
    best_val = np.inf
    stop = False

    for epoch in range(args.epochs):
        if stop:
            break
        for hb in data:
            x1 = normalize(hb.pop("x1"), mean, std, norm_in=True).astype(np.float32)
            hb["x1"] = x1
            hb = mesh_mod.pad_batch_to_devices(hb, n_dev)
            sb = mesh_mod.shard_batch(hb, mesh)
            x1 = sb.pop("x1")
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed), train_steps)
            if resampler is not None:
                k_t = jax.random.fold_in(key, 777)
                t, t_w = resampler.sample(k_t, x1.shape[0])
                state, metrics = train_step(state, x1, sb, key, t=t, t_weights=t_w)
                resampler.update_with_losses(
                    np.asarray(metrics["t"]),
                    np.asarray(metrics["loss_per_sample"]))
            else:
                state, metrics = train_step(state, x1, sb, key)
            train_steps += 1
            log_steps += 1

            if train_steps % args.log_step == 0:
                dt = time.time() - log_t0
                mse = (f" mse {float(metrics['mse']):.5f}"
                       if "mse" in metrics else "")
                logger.info(
                    f"epoch {epoch} step {train_steps}: "
                    f"loss {float(metrics['loss']):.5f}{mse} "
                    f"grad_norm {float(metrics['grad_norm']):.4f} "
                    f"steps/sec {log_steps / dt:.3f}")
                sink.log({"loss": metrics["loss"],
                          "grad_norm": metrics["grad_norm"],
                          "steps_per_sec": log_steps / dt,
                          **({"mse": metrics["mse"]} if "mse" in metrics else {})},
                         step=train_steps)
                log_t0, log_steps = time.time(), 0
            if train_steps % args.save_step == 0:
                ckpt.save(state, f"step_{train_steps}")
                ckpt.save(state, "last")
            if args.max_steps and train_steps >= args.max_steps:
                stop = True
                break

        # validation (reference train_latent.py:299-375)
        if (epoch + 1) % max(args.val_every_epochs, 1) != 0:
            continue
        vlosses = []
        for i, hb in enumerate(val):
            x1 = normalize(hb.pop("x1"), mean, std, norm_in=True).astype(np.float32)
            extras = {k: jnp.asarray(v) for k, v in hb.items()}
            m = eval_step(state, jnp.asarray(x1), extras,
                          jax.random.fold_in(rng, i))
            vlosses.append(float(m["loss"]))
        vloss = float(np.mean(vlosses)) if vlosses else np.nan
        logger.info(f"epoch {epoch}: val loss {vloss:.5f}")
        sink.log({"loss": vloss, "epoch": epoch}, step=train_steps,
                 split="val")
        if np.isfinite(vloss) and vloss < best_val:
            best_val = vloss
            ckpt.save(state, "best")
        ckpt.save(state, "last")

    ckpt.save(state, "last")
    sink.finish()
    logger.info("training done")
    return state


if __name__ == "__main__":
    main()
