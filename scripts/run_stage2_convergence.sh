#!/usr/bin/env bash
# Stage-2 convergence run: extract latents from the best Stage-1 checkpoint,
# then train the latent diffusion under the same watermark-restart supervisor
# as scripts/run_stage1_convergence.sh (the tunnel client pins every
# host->device transfer, so long runs must save + exit 75 + resume).
#
# Run AFTER the Stage-1 study finishes (or is cut):
#   scripts/run_stage2_convergence.sh
# Then evaluate the floor gap:
#   python -m codlad_tpu.cli.test --experiment recon  --vae_ckpt results/convergence/vqvae ...
#   python -m codlad_tpu.cli.test --experiment latent --vae_ckpt ... --latent_ckpt results/convergence/latent ...
set -u
VAE=${VAE:-results/convergence/vqvae}
TRAIN=${TRAIN:-/tmp/conv/train}
VAL=${VAL:-/tmp/conv/val}
FEATURES=${FEATURES:-/tmp/conv/features}
STATS=${STATS:-results/convergence/stats}
EXP=${EXP:-results/convergence/latent}
WATERMARK=${WATERMARK:-70}
MAX_STEPS=${MAX_STEPS:-50000}
# Optional absolute wall-clock deadline (unix epoch seconds).  When set,
# each (re)invocation gets the remaining budget as --max_seconds so the
# trainer saves + final-validates + exits 0 in time for downstream eval
# even if MAX_STEPS hasn't been reached (time-boxed study on a shared chip).
DEADLINE_EPOCH=${DEADLINE_EPOCH:-0}

if [ ! -f "$FEATURES/.done" ]; then
  python -m codlad_tpu.cli.extract_features --ckpt "$VAE" \
    --data_dir "$TRAIN" --out_dir "$FEATURES" \
    --batch_size "${EXTRACT_BS:-16}" \
    --stats_name CONV --stats_dir "$STATS" || exit 1
  python -m codlad_tpu.cli.extract_features --ckpt "$VAE" \
    --data_dir "$VAL" --out_dir "$FEATURES/val" \
    --batch_size "${EXTRACT_BS:-16}" \
    --stats_name CONV_VAL --stats_dir "$STATS/val_unused" || exit 1
  touch "$FEATURES/.done"
fi

while :; do
  EXTRA=""
  if [ "$DEADLINE_EPOCH" -gt 0 ]; then
    LEFT=$(( DEADLINE_EPOCH - $(date +%s) ))
    if [ "$LEFT" -le 120 ]; then
      echo "[supervisor] deadline reached — stopping with current checkpoints"
      exit 0
    fi
    EXTRA="--max_seconds $LEFT"
  fi
  python -m codlad_tpu.cli.train_latent $EXTRA \
    --feature_dir "$FEATURES" --val_dir "$FEATURES/val" --exp "$EXP" \
    --model diffusion --backbone mpnn_diffusion --latent_size 3 \
    --batch_size 128 --lr 3e-4 --warmup 3000 --schedule_steps "$MAX_STEPS" \
    --final_lr 1e-5 --max_steps "$MAX_STEPS" --save_step 2500 \
    --dropout 0.1 --bf16 --seed 12345 --val_every_epochs 10 \
    --stats_name CONV --stats_dir "$STATS" \
    --max_host_gb "$WATERMARK" --resume "$@"
  rc=$?
  if [ "$rc" -ne 75 ]; then
    echo "[supervisor] trainer exited rc=$rc — done"
    exit "$rc"
  fi
  echo "[supervisor] rc=75 (host-RSS watermark) — restarting with --resume"
done
