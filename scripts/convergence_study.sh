#!/bin/bash
# Round-4 convergence-to-floor study (VERDICT r3 #1): Stage-1 to early stop,
# Stage-2 50k steps, then recon-floor vs latent-sampled metrics on held-out
# and train proteins.  Corpus: 32 structured synthetic proteins x 1000
# frames, lengths 48-128 (see /tmp/conv/shards/manifest.json).
set -ex
C=/tmp/conv
R=results/convergence

# Stage 1 (launched separately; listed for the record):
# python -m codlad_tpu.cli.train_vqvae -data_dir $C/train -val_dir $C/val \
#   -logdir $R/vqvae -nepochs 40 -batch_size 16 -bf16 -vqdim 3 \
#   -codebook_size 512 -max_epochs_no_improve 6 -save_every_epochs 5

python -m codlad_tpu.cli.extract_features --ckpt $R/vqvae --data_dir $C/train \
  --out_dir $C/features --stats_name CONV --stats_dir $C/stats --batch_size 16

python -m codlad_tpu.cli.train_latent --feature_dir $C/features --exp $R/latent \
  --model diffusion --latent_size 3 --batch_size 32 --max_steps 50000 \
  --warmup 1000 --stats_name CONV --stats_dir $C/stats --dropout 0.1 \
  --bf16 --val_every_epochs 10 --save_step 5000 --log_step 200

# eval set: 2 held-out proteins (val) + 2 train proteins, 100 frames each
python - <<'PY'
import numpy as np, os
os.makedirs("/tmp/conv/eval_set", exist_ok=True)
for src, f in [("/tmp/conv/val", "prot_0030.npz"), ("/tmp/conv/val", "prot_0031.npz"),
               ("/tmp/conv/train", "prot_0000.npz"), ("/tmp/conv/train", "prot_0001.npz")]:
    z = np.load(os.path.join(src, f), allow_pickle=False)
    out = {k: (z[k] if k == "__spec__" else z[k][:100]) for k in z.files}
    np.savez_compressed(os.path.join("/tmp/conv/eval_set", f), **out)
print("eval set ready")
PY

# recon floor (Stage-1 only)
python -m codlad_tpu.cli.test --experiment recon --vae_ckpt $R/vqvae \
  --data_dir $C/eval_set --out_dir $R/eval_recon \
  --stats_name CONV --stats_dir $C/stats

# latent sampling (Stage 1 + Stage 2), 100-step ancestral like the reference
python -m codlad_tpu.cli.test --experiment latent --vae_ckpt $R/vqvae \
  --latent_ckpt $R/latent --data_dir $C/eval_set --out_dir $R/eval_latent \
  --num_sampling_steps 100 --num_ensemble 5 \
  --stats_name CONV --stats_dir $C/stats

echo "=== recon floor ==="; cat $R/eval_recon/summary_stats.json | head -40
echo "=== latent ==="; cat $R/eval_latent/summary_stats.json | head -40
