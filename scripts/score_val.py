"""Re-score a saved Stage-1 checkpoint's validation loss on a shard dir.

Used after the 2026-08-20 host reboot wiped the /tmp convergence corpus:
the corpus is regenerated deterministically (cli.preprocess --synthetic,
seed 0), and this script checks that the `best` checkpoint scores the SAME
static-objective val loss on the regenerated val shards as the training
log recorded on the originals (train_log.csv epoch 8: val 1.185 /
recon 1.139).  A match proves the regeneration is bit-compatible; a
mismatch means the study continues on a re-drawn corpus from the same
generator distribution and the discontinuity must be documented.

Usage: python scripts/score_val.py results/convergence/vqvae /tmp/conv/val [ckpt_name]
"""

import json
import os
import sys

import numpy as np


def main():
    logdir, val_dir = sys.argv[1], sys.argv[2]
    name = sys.argv[3] if len(sys.argv) > 3 else "best"
    cfg = json.load(open(os.path.join(logdir, "modelparams.json")))

    import jax

    if cfg.get("fast_rng"):
        jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import optax

    from codlad_tpu.data.batch import compress_indices
    from codlad_tpu.data.prefetch import prefetch
    from codlad_tpu.data.shards import ShardDataset
    from codlad_tpu.models.vae import VAE
    from codlad_tpu.models.vq import build_quantize
    from codlad_tpu.train.checkpoints import CheckpointManager
    from codlad_tpu.train.losses import LossWeights
    from codlad_tpu.train.state import create_train_state
    from codlad_tpu.train.steps import make_vqvae_step, weights_to_array

    val_data = ShardDataset(val_dir, cfg["batch_size"], seed=cfg["seed"],
                            shuffle=False)
    model = VAE(mode=cfg["train_section"], vqdim=cfg["vqdim"],
                predict_angle=cfg["predict_angle"],
                compute_dtype="bfloat16" if cfg["bf16"] else "float32",
                embed_dim=cfg["embed_dim"], n_rbf=cfg["n_rbf"],
                dec_cutoff=cfg["cg_cutoff"], dec_nconv=cfg["dec_nconv"],
                enc_nconv=cfg["enc_nconv"], activation=cfg["activation"],
                atom_cutoff=cfg["atom_cutoff"], cg_cutoff=cfg["cg_cutoff"])
    rng = jax.random.PRNGKey(cfg["seed"])
    first = {k: jnp.asarray(v) for k, v in next(iter(val_data)).items()}
    params = jax.jit(model.init)(rng, first)
    quantizer = build_quantize(
        cfg["quantize_type"], codebook_size=cfg["codebook_size"],
        dim=cfg["vqdim"], decay=cfg["codebook_ema_decay"],
        commitment_weight=cfg["codebook_temp"], levels=cfg["fsq_levels"],
        n_stages=cfg["vq_stages"], n_heads=cfg["vq_heads"])
    _, eval_step = make_vqvae_step(
        model, vq_decay=cfg["codebook_ema_decay"],
        commitment_weight=cfg["codebook_temp"], quantizer=quantizer)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.inject_hyperparams(optax.adamw)(
                         learning_rate=cfg["lr"]))
    state = create_train_state(params, tx, vq_state=quantizer.init(rng))
    state = CheckpointManager(logdir).restore(state, name)
    print(f"restored '{name}' at step {int(state.step)}")

    w_val = weights_to_array(LossWeights(
        beta=cfg["beta"], delta=cfg["delta"], eta=cfg["eta"],
        zeta=cfg["zeta"], omega=cfg["omega"], theta=cfg["theta"]))
    sums, n = {}, 0
    for i, hb in enumerate(prefetch(iter(val_data))):
        b = compress_indices({k: np.asarray(v) for k, v in hb.items()})
        b = {k: jnp.asarray(v) for k, v in b.items()}
        key = jax.random.fold_in(jax.random.PRNGKey(cfg["seed"]), i + 5)
        metrics = eval_step(state, b, key, w_val)
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + v
        n += 1
        if n % 16 == 0:
            jax.block_until_ready(sums["loss"])
    out = {k: float(v) / max(n, 1) for k, v in sums.items()}
    print(json.dumps({k: round(v, 6) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
