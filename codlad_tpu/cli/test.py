"""Inference + evaluation CLI: recon / latent / genzprot experiments.

Port of the reference harness (reference: test.py:253-966): loads the
Stage-1 (and for 'latent' the Stage-2) checkpoints, loops proteins x
ensemble x frames, computes the full metric set (RMSD, GED, clash ratio,
interaction scores, graph validity, DIV), dumps per-protein and global
summary JSON + optional multi-MODEL PDB exports.

Usage:
  python -m codlad_tpu.cli.test --experiment latent --vae_ckpt results/vq \
      --latent_ckpt results/latent --data_dir shards/test \
      --num_sampling_steps 100 --num_ensemble 10 --stats_name PED_N6
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", type=str, default="latent",
                   choices=["recon", "latent", "genzprot", "prior"],
                   help="prior = decode N(0,I) latents in NORMALIZED "
                        "space (the diffusion prior with zero denoising "
                        "steps) — the no-model floor-table baseline that "
                        "brackets what Stage 2 contributes")
    p.add_argument("--model", type=str, default="diffusion",
                   choices=["diffusion", "fm", "icfm", "vpfm", "otcfm", "sbcfm"])
    p.add_argument("--vae_ckpt", type=str, required=True)
    p.add_argument("--latent_ckpt", type=str, default=None)
    p.add_argument("--genzprot_ckpt", type=str, default=None)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, default="results/eval")
    p.add_argument("--num_sampling_steps", type=int, default=100)
    p.add_argument("--num_ensemble", type=int, default=10)
    p.add_argument("--cfg_scale", type=float, default=0.0)
    p.add_argument("--batch_size", type=int, default=96)
    p.add_argument("--method", type=str, default="euler",
                   help="ODE solver for flow models (euler/midpoint/rk4/dopri5)")
    p.add_argument("--sampler", type=str, default=None,
                   choices=["ancestral", "ddim"],
                   help="diffusion sampler; default: ddim for distilled "
                        "checkpoints (gen/distill.py), ancestral otherwise "
                        "(the reference's only sampler)")
    p.add_argument("--ddim_eta", type=float, default=0.0,
                   help="DDIM stochasticity (0 = deterministic)")
    p.add_argument("--seq_shards", type=int, default=0,
                   help="shard the residue dimension over this many devices "
                        "(ring-kNN sequence parallelism, parallel/"
                        "sequence.py) — for chains too long for one chip; "
                        "requires the padded length to divide evenly")
    p.add_argument("--rtol", type=float, default=1e-5,
                   help="dopri5 relative tolerance (reference test.py:235)")
    p.add_argument("--atol", type=float, default=1e-5,
                   help="dopri5 absolute tolerance")
    p.add_argument("--stats_name", type=str, default=None)
    p.add_argument("--stats_dir", type=str, default="datasets/miu_and_sigma")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--use_ema", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="--no-use_ema evaluates the raw (non-EMA) weights "
                        "(reference test.py:264-286 net/EMA selection)")
    p.add_argument("--save_pdb", action="store_true", default=False,
                   help="export generated ensembles as multi-MODEL PDB "
                        "(reference test.py:804-816)")
    p.add_argument("--save_xtc", action="store_true", default=False,
                   help="export generated ensembles as xtc trajectories "
                        "(reference test.py:787-803)")
    p.add_argument("--doubled_batch", action="store_true", default=False,
                   help="reproduce the reference's doubled-batch sampling")
    p.add_argument("--ensemble_fold", type=int, default=1,
                   help="ensemble members generated per sampler call by "
                        "tiling the batch (fills the chip when per-protein "
                        "batches are small; >1 uses iid, not bitwise-"
                        "reproducible, noise streams)")
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True)
    return p


def _genz_sample(model):
    """Jitted prior-sample + decode for a GenZProt model.  jit itself
    caches compilations per bucket shape — no extra memoization needed."""
    import jax

    from codlad_tpu.geometry.internal import ic_to_xyz14
    from codlad_tpu.models.vae import GenZProt

    @jax.jit
    def fn(params, b, rng):
        z, _, _ = model.apply(params, b, rng, method=GenZProt.get_latent_cg)
        ic_recon = model.apply(params, b, z, method=GenZProt.decode)
        xyz14 = ic_to_xyz14(b["cg_xyz_og"], ic_recon, b["res_type"])
        return ic_recon, xyz14

    return fn


def _export_ensembles(args, fname, batch, structures):
    """Dump generated ensembles per protein (reference test.py:787-816:
    xtc via mdtraj + pdb; here multi-MODEL PDB via data/pdb.py and xtc via
    the self-contained codec).  structures: [S, B, L, 14, 3] Å."""
    import numpy as np

    from codlad_tpu.data.pdb import write_pdb
    from codlad_tpu.data.xtc import write_xtc
    from codlad_tpu.geometry import residues as R

    base = fname.replace(".npz", "")
    S, B, L = structures.shape[:3]
    res_type = np.asarray(batch["res_type"][0])
    n_valid = int(np.asarray(batch["res_mask"][0]).sum())
    res_type = res_type[:n_valid]
    frames = structures[:, 0, :n_valid]          # ensemble of frame 0
    if args.save_pdb:
        og_res = np.concatenate([res_type[:1], res_type, res_type[-1:]])
        write_pdb(os.path.join(args.out_dir, f"{base}_gen.pdb"),
                  og_res, np.zeros_like(og_res), frames)
    if args.save_xtc:
        exists = R.ATOM14_EXISTS[res_type]        # [L, 14]
        flat = frames[:, exists]                  # [S, n_atoms, 3] Å
        write_xtc(os.path.join(args.out_dir, f"{base}_gen.xtc"),
                  flat / 10.0)                    # Å -> nm


def _load_vae(args):
    import jax
    import jax.numpy as jnp
    import optax

    from codlad_tpu.data.shards import ShardDataset
    from codlad_tpu.models.vae import VAE
    from codlad_tpu.models.vq import build_quantize
    from codlad_tpu.train.checkpoints import CheckpointManager
    from codlad_tpu.train.state import create_train_state

    ckpt = CheckpointManager(args.vae_ckpt)
    cfg = ckpt.load_config()
    if cfg.get("train_section") == "ivae":
        from codlad_tpu.models.vae import GenZProt
        model = GenZProt(
            embed_dim=cfg.get("embed_dim", 36), n_rbf=cfg.get("n_rbf", 15),
            dec_cutoff=cfg.get("cg_cutoff", 21.0),
            dec_nconv=cfg.get("dec_nconv", 4), enc_nconv=cfg.get("enc_nconv", 3),
            atom_cutoff=cfg.get("atom_cutoff", 9.0),
            cg_cutoff=cfg.get("cg_cutoff", 21.0))
        data = ShardDataset(args.data_dir, 1, shuffle=False)
        first = {k: jnp.asarray(v) for k, v in next(iter(data)).items()}
        rng = jax.random.PRNGKey(0)
        params = jax.jit(lambda r, b: model.init(r, b, rng=r))(rng, first)
        state = create_train_state(params, optax.identity())
        name = "best" if ckpt.exists("best") else "last"
        state = ckpt.restore(state, name)
        return model, state, cfg, None

    vae = VAE(mode=cfg.get("train_section", "vqvae"),
              embed_dim=cfg.get("embed_dim", 36), vqdim=cfg.get("vqdim", 3),
              predict_angle=cfg.get("predict_angle", False),
              n_rbf=cfg.get("n_rbf", 15), dec_cutoff=cfg.get("cg_cutoff", 21.0),
              dec_nconv=cfg.get("dec_nconv", 4), enc_nconv=cfg.get("enc_nconv", 3),
              atom_cutoff=cfg.get("atom_cutoff", 9.0),
              cg_cutoff=cfg.get("cg_cutoff", 21.0))
    data = ShardDataset(args.data_dir, 1, shuffle=False)
    first = {k: jnp.asarray(v) for k, v in next(iter(data)).items()}
    rng = jax.random.PRNGKey(0)
    params = jax.jit(vae.init)(rng, first)
    # the exact quantizer the checkpoint trained with (rvq/multihead carry
    # one VQState per stage/head — restore needs the matching state tree)
    quantizer = (build_quantize(
        cfg.get("quantize_type", "vqvae"),
        codebook_size=cfg.get("codebook_size", 4096),
        dim=cfg.get("vqdim", 3), levels=cfg.get("fsq_levels"),
        n_stages=cfg.get("vq_stages", 2), n_heads=cfg.get("vq_heads"))
        if cfg.get("train_section", "vqvae") == "vqvae" else None)
    vq_state = quantizer.init(rng) if quantizer is not None else None
    state = create_train_state(params, optax.identity(), vq_state=vq_state)
    name = "best" if ckpt.exists("best") else "last"
    state = ckpt.restore(state, name)
    return vae, state, cfg, quantizer


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from codlad_tpu.data.norm import load_stats
    from codlad_tpu.data.pdb import write_pdb
    from codlad_tpu.data.shards import ShardDataset, load_protein_shard
    from codlad_tpu.eval.harness import SamplingPipeline, run_ensemble
    from codlad_tpu.gen.diffusion import create_diffusion
    from codlad_tpu.gen.flow import FLOW_MATCHERS
    from codlad_tpu.models.denoiser import MPNN_MODELS
    from codlad_tpu.train.checkpoints import CheckpointManager
    from codlad_tpu.train.state import create_train_state

    os.makedirs(args.out_dir, exist_ok=True)
    vae, vae_state, vae_cfg, vae_quantizer = _load_vae(args)
    latent_size = vae_cfg.get("vqdim", 3)

    if args.stats_name:
        mean, std = load_stats(args.stats_dir, args.stats_name)
    else:
        mean = np.zeros(latent_size, np.float32)
        std = np.ones(latent_size, np.float32)

    denoiser = den_params = process = None
    if args.experiment == "latent":
        assert args.latent_ckpt, "--latent_ckpt required for latent experiment"
        lat_ckpt = CheckpointManager(args.latent_ckpt)
        lat_cfg = lat_ckpt.load_config()
        learn_sigma = lat_cfg.get("model", "diffusion") in ("diffusion", "sbcfm")
        denoiser = MPNN_MODELS[lat_cfg.get("backbone", "mpnn_diffusion")](
            input_size=latent_size, learn_sigma=learn_sigma, dropout=0.0,
            adaln_mode=lat_cfg.get("adaln_mode", "trunk"),
            self_condition=lat_cfg.get("self_condition", False))
        data0 = ShardDataset(args.data_dir, 1, shuffle=False)
        first = {k: jnp.asarray(v) for k, v in next(iter(data0)).items()}
        B0, L0 = first["res_type"].shape
        params = jax.jit(denoiser.init)(
            jax.random.PRNGKey(0), jnp.zeros((B0, L0, latent_size)),
            jnp.zeros((B0,), jnp.int32), first["res_type"],
            first["cg_xyz_og"][:, 1:-1], first["res_mask"])
        lstate = create_train_state(params, optax.identity(), with_ema=True)
        name = "best" if lat_ckpt.exists("best") else "last"
        lstate = lat_ckpt.restore(lstate, name)
        den_params = lstate.ema_params if args.use_ema else lstate.params
        if args.model == "diffusion":
            if lat_cfg.get("distill_tmap"):
                # progressively-distilled student: its sampling grid is
                # teacher_grid[0::2]^k, stored verbatim in the config —
                # evaluating on any other grid wastes the distillation
                from codlad_tpu.gen.diffusion import diffusion_from_tmap
                tmap = lat_cfg["distill_tmap"]
                if args.num_sampling_steps != len(tmap):
                    print(f"note: distilled checkpoint has a fixed "
                          f"{len(tmap)}-step grid; ignoring "
                          f"--num_sampling_steps {args.num_sampling_steps}")
                process = diffusion_from_tmap(
                    tmap,
                    noise_schedule=lat_cfg.get("noise_schedule", "linear"),
                    diffusion_steps=lat_cfg.get("diffusion_steps", 1000),
                    learn_sigma=True)
            else:
                process = create_diffusion(
                    str(args.num_sampling_steps),
                    diffusion_steps=lat_cfg.get("diffusion_steps", 1000),
                    learn_sigma=True)
            if args.sampler is None:
                args.sampler = ("ddim" if lat_cfg.get("distill_tmap")
                                else "ancestral")
        else:
            process = FLOW_MATCHERS[args.model]()

    pipeline = SamplingPipeline(
        denoiser=denoiser, denoiser_params=den_params, process=process,
        process_kind=args.model, vae=vae, vae_params=vae_state.params,
        vq_state=vae_state.vq_state, quantizer=vae_quantizer,
        norm_mean=mean, norm_std=std,
        latent_size=latent_size, doubled_batch=args.doubled_batch,
        cfg_scale=args.cfg_scale,
        ode_steps=args.num_sampling_steps, ode_method=args.method,
        ode_rtol=args.rtol, ode_atol=args.atol,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        sampler=args.sampler or "ancestral", ddim_eta=args.ddim_eta,
        seq_shards=args.seq_shards)

    data = ShardDataset(args.data_dir, args.batch_size, shuffle=False)
    # built ONCE so its inner jit cache persists across proteins/ensembles
    # (per-bucket compilations are cached by jit itself)
    genz_fn = _genz_sample(vae) if args.experiment == "genzprot" else None
    summary = {}
    t_start = time.time()
    for fname in data.files:
        spec, shard = load_protein_shard(os.path.join(args.data_dir, fname))
        n = min(shard["res_type"].shape[0], args.batch_size)
        batch = {k: jnp.asarray(v[:n]) for k, v in shard.items()}
        t0 = time.time()
        export = args.save_pdb or args.save_xtc
        log_fn = (lambda s, m: print(
            f"  {fname} ensemble {s}: " +
            " ".join(f"{k}={v:.4f}" for k, v in m.items()), flush=True))
        structures = None
        if args.experiment == "latent":
            agg = run_ensemble(pipeline, batch, args.num_ensemble,
                               seed=args.seed, return_structures=export,
                               log_fn=log_fn, fold=args.ensemble_fold)
            if export:
                agg, structures = agg
        elif args.experiment == "prior":
            # no-model baseline: decode iid N(0,I) latents (normalized
            # space = the diffusion prior at t=T, zero denoising) through
            # the same VQ-snap + IC-decode path; the trained Stage-2
            # latent number should land between this and the recon floor
            latent_dim = pipeline.latent_size
            def sample_fn(rng, b):
                lat = jax.random.normal(
                    rng, b["res_type"].shape + (latent_dim,))
                return pipeline.decode(b, lat)
            agg = run_ensemble(pipeline, batch, args.num_ensemble,
                               seed=args.seed, sample_fn=sample_fn,
                               return_structures=export, log_fn=log_fn,
                               fold=args.ensemble_fold)
            if export:
                agg, structures = agg
        elif args.experiment == "genzprot":
            # decode latents sampled from the CG-conditioned prior
            # (reference test.py:499,555: GenZProt C2 path)
            sample_fn = lambda rng, b: genz_fn(vae_state.params, b, rng)
            agg = run_ensemble(pipeline, batch, args.num_ensemble,
                               seed=args.seed, sample_fn=sample_fn,
                               return_structures=export, log_fn=log_fn,
                               fold=args.ensemble_fold)
            if export:
                agg, structures = agg
        else:
            from codlad_tpu.eval.harness import evaluate_structures
            h = pipeline.encode_latents(batch)
            h_norm = (np.asarray(h) - mean) / std
            ic_recon, xyz14 = pipeline.decode(batch, jnp.asarray(h_norm))
            agg = {k: float(v) for k, v in
                   evaluate_structures(batch, ic_recon, xyz14).items()}
            if args.save_pdb:
                og_res = np.concatenate([
                    batch["res_type"][:, :1], batch["res_type"],
                    batch["res_type"][:, -1:]], axis=1)[0]
                og_chain = np.zeros_like(og_res)
                write_pdb(os.path.join(args.out_dir, fname.replace(".npz", "_recon.pdb")),
                          np.asarray(og_res), og_chain, np.asarray(xyz14))
        if structures is not None:
            _export_ensembles(args, fname, batch, structures)
        agg["wallclock_sec"] = time.time() - t0
        summary[fname] = agg
        print(f"{fname}: " + " ".join(
            f"{k}={v:.4f}" for k, v in agg.items() if np.isscalar(v)),
            flush=True)

    # global mean +- std over proteins (reference test.py:821-889)
    keys = [k for k, v in next(iter(summary.values())).items()
            if np.isscalar(v)]
    per_protein = {k: [v[k] for v in summary.values() if k in v]
                   for k in keys}
    summary["__global__"] = {k: float(np.mean(vs))
                             for k, vs in per_protein.items()}
    summary["__global_stats__"] = {
        k: {"mean": float(np.mean(vs)), "std": float(np.std(vs))}
        for k, vs in per_protein.items()}
    summary["__global__"]["total_sec"] = time.time() - t_start
    with open(os.path.join(args.out_dir, "summary_stats.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("global:", json.dumps(summary["__global__"], indent=2))
    return summary


if __name__ == "__main__":
    main()
