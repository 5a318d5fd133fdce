"""Stage bridge CLI: run the frozen Stage-1 encoder over shards and save
per-protein latent features + normalization stats.

Equivalent of `extract_features.py --extract_features` (reference:
extract_features.py:181-291): pre-VQ latents (`get_latent_wovq`) are what
Stage 2 trains on; channel mean/std over the train split are saved for
normalization; a codebook-usage histogram is recorded as a sanity signal.

Usage:
  python -m codlad_tpu.cli.extract_features --ckpt results/run1 \
      --data_dir shards/train --out_dir features/train --stats_name PED_N6
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--stats_name", type=str, default=None,
                   help="if set, save channel mean/std as this name")
    p.add_argument("--stats_dir", type=str, default="datasets/miu_and_sigma")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learn_sigma", action="store_true", default=False,
                   help="save mu||sigma concat latents for the vae paths "
                        "(reference CustomDataset learn_sigma variant, "
                        "dataset_module.py:419-454)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from codlad_tpu.data.norm import compute_stats, save_stats
    from codlad_tpu.data.shards import ShardDataset, load_protein_shard
    from codlad_tpu.models.vae import VAE
    from codlad_tpu.models.vq import build_quantize
    from codlad_tpu.train.checkpoints import CheckpointManager
    from codlad_tpu.train.state import create_train_state

    ckpt = CheckpointManager(args.ckpt)
    cfg = ckpt.load_config()
    vae = VAE(mode=cfg.get("train_section", "vqvae"),
              embed_dim=cfg.get("embed_dim", 36), vqdim=cfg.get("vqdim", 3),
              predict_angle=cfg.get("predict_angle", False),
              n_rbf=cfg.get("n_rbf", 15), dec_cutoff=cfg.get("cg_cutoff", 21.0),
              dec_nconv=cfg.get("dec_nconv", 4), enc_nconv=cfg.get("enc_nconv", 3),
              atom_cutoff=cfg.get("atom_cutoff", 9.0),
              cg_cutoff=cfg.get("cg_cutoff", 21.0))

    data = ShardDataset(args.data_dir, args.batch_size, shuffle=False)
    first = {k: jnp.asarray(v) for k, v in next(iter(data)).items()}
    rng = jax.random.PRNGKey(0)
    params = jax.jit(vae.init)(rng, first)
    # rebuild the EXACT quantizer the checkpoint was trained with (state
    # tree shape must match for restore: rvq/multihead carry one VQState
    # per stage/head, fsq none)
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
    print(f"loaded {name} checkpoint (step {int(state.step)})")

    mode = cfg.get("train_section", "vqvae")

    from codlad_tpu.data.batch import compress_indices, decompress_indices

    # The encoder touches only these keys (models/encoder.py,
    # models/prior.py); shipping the full shard dict would also push the
    # 32k-capacity clash/inter/bond edge lists through the tunnel for
    # nothing.
    ENC_KEYS = ("res_type", "atom_mask", "xyz14", "cg_xyz_og", "res_mask",
                "atom_edges", "atom_edges_mask", "cg_edges", "cg_edges_mask")

    @jax.jit
    def encode(b, key):
        b = decompress_indices(b)
        h, (mu, sigma) = vae.apply(state.params, b, method=VAE.encode)
        if mode in ("fgvae", "cgvae"):
            if args.learn_sigma:
                # mu||sigma concat (reference CustomDataset learn_sigma,
                # dataset_module.py:419-454)
                return jnp.concatenate([mu, sigma], axis=-1), None, None
            # one reparametrized draw kept for compatibility (`latents`),
            # but mu/sigma are ALSO saved so the Stage-2 loader re-draws
            # x1 = mu + sigma*eps FRESH each epoch, matching the
            # reference's on-every-access reparametrization
            # (utils/dataset_module.py:419-454); round 2 froze one draw
            h = mu + sigma * jax.random.normal(key, sigma.shape)
            return h, mu, sigma
        return h, None, None

    os.makedirs(args.out_dir, exist_ok=True)
    all_latents, all_masks = [], []
    usage = np.zeros(cfg.get("codebook_size", 4096), np.int64)

    B = args.batch_size
    for fname in data.files:
        spec, shard = load_protein_shard(os.path.join(args.data_dir, fname))
        # chunk the shard's frames at a static batch shape: a whole
        # convergence-scale shard (1000 frames x 32k-edge capacity) is
        # ~33 GB as one jit call — 2x the chip's HBM.  The last chunk is
        # padded by repeating its final frame so every chunk reuses the
        # same compiled (L-bucket, B) executable.
        n = shard["res_type"].shape[0]
        hs, mus, sigmas = [], [], []
        for i0 in range(0, n, B):
            nb = min(B, n - i0)
            sl = {k: shard[k][i0:i0 + B] for k in ENC_KEYS if k in shard}
            if nb < B:
                sl = {k: np.concatenate(
                    [v, np.repeat(v[-1:], B - nb, axis=0)], axis=0)
                    for k, v in sl.items()}
            sl = compress_indices(sl)
            b = {k: jnp.asarray(v) for k, v in sl.items()}
            hc, mc, sc = encode(
                b, jax.random.fold_in(rng, (hash(fname) ^ i0) % (2**31)))
            hs.append(np.asarray(hc)[:nb])
            if mc is not None:
                mus.append(np.asarray(mc)[:nb])
                sigmas.append(np.asarray(sc)[:nb])
        h = np.concatenate(hs, axis=0)
        mask = shard["res_mask"]
        extra = {}
        if mus:
            extra = {"mu": np.concatenate(mus, 0).astype(np.float32),
                     "sigma": np.concatenate(sigmas, 0).astype(np.float32)}
        np.savez_compressed(
            os.path.join(args.out_dir, fname),
            latents=h.astype(np.float32), res_mask=mask,
            res_type=shard["res_type"], cg_xyz_og=shard["cg_xyz_og"],
            ic=shard["ic"], prot_idx=shard["prot_idx"], **extra)
        all_latents.append(h)
        all_masks.append(mask)
        if state.vq_state is not None:
            _, idx = quantizer.snap(state.vq_state,
                                    jnp.asarray(h.reshape(-1, h.shape[-1])))
            idx = np.asarray(idx)[mask.reshape(-1)]
            # multi-stage/-head variants: every stage's code joins the
            # histogram (stages share the codebook size)
            usage += np.bincount(idx.reshape(-1), minlength=len(usage))
        print(f"{fname}: {h.shape}", flush=True)

    if args.stats_name:
        mean, std = compute_stats(all_latents, all_masks)
        save_stats(args.stats_dir, args.stats_name, mean, std)
        print(f"stats {args.stats_name}: mean={mean} std={std}")

    active = int((usage > 0).sum())
    np.save(os.path.join(args.out_dir, "codebook_usage.npy"), usage)
    if state.vq_state is not None:
        _dump_codebook_usage(args.out_dir, usage)
    with open(os.path.join(args.out_dir, "manifest.json"), "w") as f:
        json.dump({"files": data.files, "codebook_active": active}, f, indent=2)
    if state.vq_state is not None:
        print(f"codebook usage: {active}/{len(usage)} codes active")


def _dump_codebook_usage(out_dir, usage):
    """CSV + PNG of codebook-usage counts (reference extract_features.py:
    23-53 `plot_hist_and_save`)."""
    import csv

    with open(os.path.join(out_dir, "codebook_usage.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["code", "count"])
        for i, c in enumerate(usage):
            w.writerow([i, int(c)])
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 3))
        ax.bar(np.arange(len(usage)), usage, width=1.0)
        ax.set_xlabel("code index")
        ax.set_ylabel("count")
        active = int((usage > 0).sum())
        ax.set_title(f"codebook usage: {active}/{len(usage)} active")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "codebook_usage.png"), dpi=100)
        plt.close(fig)
    except Exception as e:  # headless plotting is best-effort
        print(f"codebook usage plot skipped: {e}")


if __name__ == "__main__":
    main()
