"""Stage-1 trainer CLI: VQ-VAE / FG-VAE / GenZProt over featurized shards.

Port of the reference trainer (reference: train_vqvae.py:33-384): same
JSON-over-argparse config, loss-weight schedule, Adam(+exp decay) or
AdamW(+plateau LR), LOWESS-smoothed best-model selection, EarlyStopping(20),
NaN abort, CSV metric log, per-epoch/best/last checkpoints.

Usage:
  python -m codlad_tpu.cli.train_vqvae -load_json scripts/vqvae_ped.json \
      -data_dir shards/train -val_dir shards/val -logdir results/run1
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from codlad_tpu.cli.config import parse_with_json


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-load_json", type=str, default=None)
    p.add_argument("-logdir", type=str, required=False, default="results/vqvae")
    p.add_argument("-data_dir", type=str, default=None)
    p.add_argument("-val_dir", type=str, default=None)
    p.add_argument("-dataset", type=str, default="PED")
    p.add_argument("-train_section", type=str, default="vqvae",
                   choices=["vqvae", "fgvae", "fgae", "ivae"])
    p.add_argument("-seed", type=int, default=12345)
    p.add_argument("-batch_size", type=int, default=4)
    p.add_argument("-nepochs", type=int, default=600)
    p.add_argument("-save_every_epochs", type=int, default=10,
                   help="periodic epoch_{N} checkpoints (reference saves "
                        "model_{epoch}.pt every epoch, train_vqvae.py:303)")
    p.add_argument("-resume", action="store_true", default=False)
    p.add_argument("-lr", type=float, default=1e-3)
    p.add_argument("-factor", type=float, default=0.3)
    p.add_argument("-dynamic_loss", action="store_true", default=True)
    p.add_argument("-scheduler_flag", action="store_true", default=False)
    # loss weights (reference train_vqvae.py:349-356)
    p.add_argument("-beta", type=float, default=0.05)
    p.add_argument("-gamma", type=float, default=1.0)
    p.add_argument("-delta", type=float, default=1.0)
    p.add_argument("-eta", type=float, default=1.0)
    p.add_argument("-zeta", type=float, default=5.0)
    p.add_argument("-omega", type=float, default=3.0)
    p.add_argument("-theta", type=float, default=0.0)
    # model
    p.add_argument("-embed_dim", type=int, default=36)
    p.add_argument("-vqdim", type=int, default=36)
    p.add_argument("-n_rbf", type=int, default=15)
    p.add_argument("-atom_cutoff", type=float, default=9.0)
    p.add_argument("-cg_cutoff", type=float, default=21.0)
    p.add_argument("-edgeorder", type=int, default=2)
    p.add_argument("-activation", type=str, default="swish")
    p.add_argument("-enc_nconv", type=int, default=3)
    p.add_argument("-dec_nconv", type=int, default=4)
    p.add_argument("-predict_angle", action="store_true", default=False)
    # vq
    p.add_argument("-bf16", action="store_true", default=False,
                   help="run the encoder's tensor-product feature path in "
                        "bf16 (geometry and losses stay f32)")
    p.add_argument("-quantize_type", type=str, default="vqvae",
                   help="VQ variant: one of "
                        "vqvae/cosine/orthogonal/expire/fsq/rvq/multihead/"
                        "gumbel, or any reference method string "
                        "(vqema, vq_3, fsq_5, Expiring_stalevq, "
                        "orthogonal_vq, headvq, low_cosvq_3, "
                        "low3_num16_gumble_cos — build_quantize dispatch, "
                        "utils/vq_module.py:98-163; rvq is an extension: "
                        "n-stage residual quantization)")
    p.add_argument("-fsq_levels", type=int, nargs="*", default=None,
                   help="FSQ levels (reference default [7,5,5,5,5]; "
                        "vqdim must equal len(levels))")
    p.add_argument("-vq_stages", type=int, default=2,
                   help="rvq: number of residual stages")
    p.add_argument("-vq_heads", type=int, default=None,
                   help="multihead: number of heads (vqdim must divide)")
    p.add_argument("-codebook_size", type=int, default=256)
    p.add_argument("-codebook_temp", type=float, default=0.25)
    p.add_argument("-codebook_ema_decay", type=float, default=0.99)
    p.add_argument("-max_epochs_no_improve", type=int, default=20)
    p.add_argument("-fast_rng", "--fast_rng",
                   action=argparse.BooleanOptionalAction,
                   default=True,
                   help="use the TPU-native 'rbg' PRNG (hardware RNG) "
                        "instead of threefry; --no-fast_rng restores "
                        "threefry for bit-exact reproducibility")
    p.add_argument("-dp", "--dp", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="data-parallel training over all local devices "
                        "(batch sharded on a 1-D mesh, params replicated, "
                        "gradient/VQ-EMA reductions over ICI; extension "
                        "beyond the reference's single-GPU Stage 1). "
                        "Engages only when >1 device is visible; "
                        "batch_size is rounded up to a device multiple")
    p.add_argument("-mix_batches", "--mix_batches",
                   action=argparse.BooleanOptionalAction,
                   default=True,
                   help="pool frames across proteins within a compilation "
                        "bucket so batches mix proteins (the reference "
                        "MultiPKLDataset pool semantics, "
                        "dataset_module.py:26-117)")
    p.add_argument("-max_host_gb", type=float, default=100.0,
                   help="host-RSS watermark: the remote-TPU tunnel client "
                        "pins every host->device transfer for process "
                        "lifetime, so long runs leak ~the bytes they ship "
                        "and OOM the host. When end-of-epoch RSS exceeds "
                        "this, save last + exit code 75 so a supervisor "
                        "loop can re-invoke with -resume (0 disables)")
    return p


def host_rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return 0.0


def main(argv=None):
    args = parse_with_json(build_parser(), argv)

    import jax

    if getattr(args, "fast_rng", False):
        # must be set before any key is created
        jax.config.update("jax_default_prng_impl", "rbg")

    import jax.numpy as jnp
    import optax

    from codlad_tpu.data.shards import ShardDataset
    from codlad_tpu.models.vae import VAE, GenZProt
    from codlad_tpu.models.vq import vq_init
    from codlad_tpu.train.checkpoints import CheckpointManager
    from codlad_tpu.train.logging_utils import (
        CSVLogger, EarlyStopping, PlateauLR, Timer, create_logger,
        lowess_smooth, read_epoch_rows, replay_selection, rewrite_epoch_rows)
    from codlad_tpu.train.losses import LossWeights
    from codlad_tpu.train.state import create_train_state, exp_decay_schedule
    from codlad_tpu.train.steps import (
        make_genzprot_step, make_vqvae_step, weights_to_array)

    logger = create_logger(args.logdir)
    ckpt = CheckpointManager(args.logdir)

    from codlad_tpu.train import mesh as mesh_mod
    n_dev = jax.device_count()
    mesh = None
    if args.dp and n_dev > 1:
        if args.batch_size % n_dev:
            new_bs = -(-args.batch_size // n_dev) * n_dev
            logger.info(f"dp: batch_size {args.batch_size} -> {new_bs} "
                        f"(multiple of {n_dev} devices)")
            args.batch_size = new_bs  # before save_config: record the
            #                           batch size actually trained with
        mesh = mesh_mod.make_mesh(n_dev)
        # batch-partitioned Pallas execution (see kernels/meshing.py)
        from codlad_tpu.kernels.meshing import set_kernel_mesh
        set_kernel_mesh(mesh)
        logger.info(f"data-parallel over {n_dev} device(s)")

    ckpt.save_config(vars(args))
    logger.info(f"args: {vars(args)}")

    if args.mix_batches:
        from codlad_tpu.data.shards import MixedShardDataset
        train_data = MixedShardDataset(args.data_dir, args.batch_size,
                                       seed=args.seed)
    else:
        train_data = ShardDataset(args.data_dir, args.batch_size,
                                  seed=args.seed)
    val_data = ShardDataset(args.val_dir or args.data_dir, args.batch_size,
                            seed=args.seed, shuffle=False)

    genzprot = args.train_section == "ivae"
    common = dict(embed_dim=args.embed_dim, n_rbf=args.n_rbf,
                  dec_cutoff=args.cg_cutoff, dec_nconv=args.dec_nconv,
                  enc_nconv=args.enc_nconv, activation=args.activation,
                  atom_cutoff=args.atom_cutoff, cg_cutoff=args.cg_cutoff)
    rng = jax.random.PRNGKey(args.seed)

    # init with the first batch shape
    first = {k: jnp.asarray(v) for k, v in next(iter(val_data)).items()}
    if genzprot:
        model = GenZProt(**common)
        params = jax.jit(lambda r, b: model.init(r, b, rng=r))(rng, first)
        train_step, eval_step = make_genzprot_step(model, beta=args.beta)
        vq_state = None
    else:
        model = VAE(mode=args.train_section, vqdim=args.vqdim,
                    predict_angle=args.predict_angle,
                    compute_dtype="bfloat16" if args.bf16 else "float32",
                    **common)
        params = jax.jit(model.init)(rng, first)
        from codlad_tpu.models.vq import build_quantize
        quantizer = (build_quantize(
            args.quantize_type, codebook_size=args.codebook_size,
            dim=args.vqdim, decay=args.codebook_ema_decay,
            commitment_weight=args.codebook_temp,
            levels=args.fsq_levels, n_stages=args.vq_stages,
            n_heads=args.vq_heads)
            if args.train_section == "vqvae" else None)
        train_step, eval_step = make_vqvae_step(
            model, vq_decay=args.codebook_ema_decay,
            commitment_weight=args.codebook_temp, quantizer=quantizer)
        vq_state = quantizer.init(rng) if quantizer is not None else None

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info(f"model parameters: {n_params:,}")

    if args.scheduler_flag:
        sched = exp_decay_schedule(args.lr)
        tx = optax.chain(optax.clip_by_global_norm(5.0),
                         optax.adamw(sched, weight_decay=1e-3))
        plateau = None
    else:
        plateau = PlateauLR(args.lr, factor=args.factor)
        # inject_hyperparams keeps the LR inside opt_state so plateau drops
        # do NOT retrigger compilation of the train step
        tx = optax.chain(optax.clip_by_global_norm(5.0),
                         optax.inject_hyperparams(optax.adamw)(
                             learning_rate=args.lr))
    state = create_train_state(params, tx, vq_state=vq_state)

    fields = ["epoch", "train_loss", "val_loss", "recon", "graph", "clash",
              "inter", "xyz", "vq", "kl", "lr"]
    log_csv = os.path.join(args.logdir, "train_log.csv")

    start_epoch = 0
    past_rows = []
    if args.resume:
        # prefer last, else the newest epoch_N snapshot, else best — and
        # NEVER silently start fresh: a corrupted/unfinalized `last` once
        # cost a run 4 epochs of progress before this fallback existed
        resume_from = ckpt.best_resume_name("epoch")
        if resume_from is None:
            logger.warning("-resume given but no finalized checkpoint "
                           f"found under {args.logdir}; starting fresh")
        else:
            if resume_from != "last":
                logger.warning(f"'last' checkpoint unusable; resuming from "
                               f"'{resume_from}' instead")
            state = ckpt.restore(state, resume_from)
            logger.info(f"resumed from step {int(state.step)}")
        # continue the EPOCH schedule too (dynamic loss weights and the
        # save cadence are epoch-keyed): pick up after the last epoch the
        # run log recorded — unless we fell back to an epoch_N snapshot,
        # which pins the schedule to N+1 regardless of what the log saw.
        # The CSV is read DEDUPED (restarts used to re-append rows).
        rows = read_epoch_rows(log_csv)
        if resume_from is not None and resume_from.startswith("epoch_"):
            start_epoch = int(resume_from.split("_")[1]) + 1
            logger.info(f"resuming at epoch {start_epoch}")
        elif resume_from is not None and rows:
            start_epoch = int(float(rows[-1]["epoch"])) + 1
            logger.info(f"resuming at epoch {start_epoch}")
        # rows at/after start_epoch are stale (an epoch_N fallback re-runs
        # them); everything earlier replays into the selection state below
        past_rows = [r for r in rows
                     if int(float(r["epoch"])) < start_epoch]
        if resume_from is not None:
            rewrite_epoch_rows(log_csv, past_rows, fields)
    if mesh is not None:
        state = mesh_mod.replicate(state, mesh)

    csvlog = CSVLogger(log_csv, fields)
    from codlad_tpu.train.logging_utils import MetricsSink
    sink = MetricsSink(args.logdir, run_name=os.path.basename(args.logdir),
                       config=vars(args))

    base_w = LossWeights(beta=args.beta, delta=args.delta, eta=args.eta,
                         zeta=args.zeta, omega=args.omega, theta=args.theta)
    stopper = EarlyStopping(args.max_epochs_no_improve)
    # selection state survives watermark restarts: replay the on-disk
    # validation history through the exact selection logic (LOWESS + best +
    # plateau + patience) so a restart is state-equivalent to never having
    # stopped — a fresh `best_val = inf` here once let the FIRST epoch
    # after every restart unconditionally overwrite `best` and kept
    # patience/plateau from ever accumulating (VERDICT r4 weak #3)
    val_history, best_val, best_i = replay_selection(
        [float(r["val_loss"]) for r in past_rows if r.get("val_loss")],
        plateau=plateau, stopper=stopper)
    current_lr = plateau.lr if plateau is not None else args.lr
    if val_history:
        epochs_seen = [int(float(r["epoch"])) for r in past_rows
                       if r.get("val_loss")]
        best_epoch = epochs_seen[best_i] if best_i >= 0 else -1
        logger.info(
            f"selection state replayed from {len(val_history)} logged "
            f"epochs: best smoothed val {best_val:.4f} @ epoch "
            f"{best_epoch}, early-stop patience {stopper.counter}/"
            f"{stopper.patience}, lr {current_lr:.2e}")
        if current_lr != args.lr:
            from codlad_tpu.train.state import set_learning_rate
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, current_lr))
        if stopper.early_stop:
            logger.info("early stop already reached in the logged history "
                        "— nothing to train")
            return state

    # validation always scores the FULL static objective: the dynamic
    # schedule disables xyz+clash at epoch 0 (and doubles clash past 20),
    # so epoch-keyed val losses are incomparable across epochs — epoch 0's
    # artificially easy number once pinned best-model selection and ran
    # the early-stop clock on an unbeatable target (reference
    # train_module.py:197-202 applies the schedule to BOTH splits; its
    # 600-epoch/patience-20 regime hides the artifact, short runs don't)
    w_val = weights_to_array(base_w)

    for epoch in range(start_epoch, args.nepochs):
        w = weights_to_array(base_w.dynamic(epoch, args.dynamic_loss))
        timer = Timer()

        def device_batches(data):
            # host pipeline as a generator so `prefetch` overlaps it with
            # the device step; edge indices travel as uint16 (HALF the
            # per-batch bytes through the remote-TPU tunnel — the jitted
            # step upcasts at trace time, see data.batch.compress_indices)
            from codlad_tpu.data.batch import compress_indices
            for hb in data:
                hb = compress_indices({k: np.asarray(v) for k, v in hb.items()})
                if mesh is not None:
                    yield mesh_mod.shard_batch(hb, mesh)
                else:
                    yield {k: jnp.asarray(v) for k, v in hb.items()}

        from codlad_tpu.data.prefetch import prefetch

        def run(data, step_fn, train):
            # accumulate metrics ON DEVICE; a float() per step would force a
            # host sync every step
            sums, n = {}, 0
            nonlocal state
            for i, b in enumerate(prefetch(device_batches(data))):
                key = jax.random.fold_in(jax.random.PRNGKey(args.seed),
                                         epoch * 100000 + i + (0 if train else 5))
                if train:
                    state, metrics = step_fn(state, b, key, w)
                else:
                    metrics = step_fn(state, b, key, w_val)
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0.0) + v
                n += 1
                if n % 16 == 0:
                    # bound the async-dispatch queue: with a fast host
                    # pipeline the loop otherwise enqueues the WHOLE
                    # epoch's batches (host staging for 1875 steps of
                    # graph-sized batches OOM-killed a 125 GB host);
                    # syncing on the running metric caps the lead at 16
                    # steps while keeping host/device overlap
                    jax.block_until_ready(sums["loss"])
            return {k: float(v) / max(n, 1) for k, v in sums.items()}

        tm = run(train_data, train_step, True)
        vm = run(val_data, eval_step, False)
        dt = timer.lap()
        logger.info(
            f"epoch {epoch}: train {tm.get('loss', np.nan):.4f} "
            f"val {vm.get('loss', np.nan):.4f} recon {vm.get('recon', np.nan):.4f} "
            f"lr {current_lr:.2e} ({dt:.1f}s)")
        csvlog.append({"epoch": epoch, "train_loss": tm.get("loss"),
                       "val_loss": vm.get("loss"), "recon": vm.get("recon"),
                       "graph": vm.get("graph"), "clash": vm.get("clash"),
                       "inter": vm.get("inter"), "xyz": vm.get("xyz"),
                       "vq": vm.get("vq", 0), "kl": vm.get("kl", 0),
                       "lr": current_lr})
        sink.log({"loss": tm.get("loss"), "lr": current_lr}, step=epoch)
        sink.log({k: v for k, v in vm.items()}, step=epoch, split="val")

        if not np.isfinite(vm.get("loss", np.nan)):
            logger.info("NaN validation loss — aborting (reference behavior)")
            break

        # LOWESS-smoothed validation drives selection, plateau LR and early
        # stopping (reference train_vqvae.py:276-295)
        val_history.append(vm["loss"])
        smoothed = lowess_smooth(val_history)[-1]
        if plateau is not None:
            new_lr = plateau.step(smoothed)
            if new_lr != current_lr:
                logger.info(f"plateau: lr {current_lr:.2e} -> {new_lr:.2e}")
                current_lr = new_lr
                from codlad_tpu.train.state import set_learning_rate
                state = state.replace(
                    opt_state=set_learning_rate(state.opt_state, new_lr))
        if smoothed < best_val:
            best_val = smoothed
            ckpt.save(state, "best")
        ckpt.save(state, "last")
        if args.save_every_epochs and epoch % args.save_every_epochs == 0:
            # reference saves model_{epoch}.pt every epoch
            # (train_vqvae.py:303-320); epoch granularity preserved for
            # resume parity, default thinned to every 10
            ckpt.save(state, f"epoch_{epoch}")
        if stopper(smoothed):
            logger.info("early stopping")
            break
        rss = host_rss_gb()
        if args.max_host_gb and rss > args.max_host_gb:
            logger.info(f"host RSS {rss:.1f} GB > watermark "
                        f"{args.max_host_gb:.1f} GB — checkpoints saved, "
                        "exiting 75 for supervised restart (tunnel-client "
                        "transfer leak; see scripts/run_stage1_convergence.sh)")
            raise SystemExit(75)

    logger.info("training done")
    return state


if __name__ == "__main__":
    main()
