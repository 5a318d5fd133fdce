#!/usr/bin/env bash
# Round-5 convergence-to-floor orchestrator (VERDICT r4 item 1).
#
# Runs the WHOLE remaining study unattended on the single tunneled chip:
#   1. wait for the Stage-1 supervisor (scripts/run_stage1_convergence.sh,
#      PID in /tmp/stage1_sup.pid) to reach its early stop
#   2. Stage 2: extract latents from the best Stage-1 checkpoint + train
#      the latent diffusion (scripts/run_stage2_convergence.sh, watermark
#      supervisor inside)
#   3. evaluate BOTH experiments on the held-out val proteins with the
#      reference eval recipe (100-step sampling, ensemble 10,
#      test.py:481-698 metric suite):
#        recon  = Stage-1 encode->VQ->decode floor
#        latent = Stage-2 sampled latents -> decode
#   4. emit the recon-vs-latent floor table (results/convergence/FLOOR_TABLE.md)
#
# Usage: nohup scripts/run_floor_study_r5.sh > /tmp/floor_study.log 2>&1 &
#
# Time-boxing on a shared/tunneled chip: set DEADLINE_EPOCH (unix seconds)
# and MAX_STEPS in the environment — both propagate into
# run_stage2_convergence.sh, which converts the deadline into a
# --max_seconds clean stop (save + final validation + rc 0) so the evals
# and the floor table still land inside the budget.
set -u
cd "$(dirname "$0")/.."
LOG=results/convergence

if [ -f /tmp/stage1_sup.pid ]; then
  S1PID=$(cat /tmp/stage1_sup.pid)
  echo "[floor] waiting for Stage-1 supervisor (pid $S1PID)"
  while kill -0 "$S1PID" 2>/dev/null; do sleep 60; done
  echo "[floor] Stage-1 supervisor exited"
fi
if [ ! -d "$LOG/vqvae/best" ]; then
  echo "[floor] no Stage-1 best checkpoint — aborting" >&2
  exit 1
fi
tail -3 "$LOG/vqvae/log.txt"

echo "[floor] === Stage 2: extract + latent diffusion ==="
WATERMARK=${WATERMARK:-70} MAX_STEPS=${MAX_STEPS:-50000} \
  scripts/run_stage2_convergence.sh || exit 1

echo "[floor] === eval: recon floor (Stage 1) ==="
python -m codlad_tpu.cli.test --experiment recon \
  --vae_ckpt "$LOG/vqvae" --data_dir /tmp/conv/val \
  --out_dir "$LOG/eval_recon" --num_sampling_steps 100 --num_ensemble 10 \
  --stats_name CONV --stats_dir "$LOG/stats" || exit 1

echo "[floor] === eval: latent sampled (Stage 1+2) ==="
python -m codlad_tpu.cli.test --experiment latent \
  --vae_ckpt "$LOG/vqvae" --latent_ckpt "$LOG/latent" \
  --data_dir /tmp/conv/val \
  --out_dir "$LOG/eval_latent" --num_sampling_steps 100 --num_ensemble 10 \
  --stats_name CONV --stats_dir "$LOG/stats" || exit 1

echo "[floor] === floor table ==="
python scripts/summarize_convergence.py "$LOG" | tee "$LOG/FLOOR_TABLE.md"
echo "[floor] DONE"
