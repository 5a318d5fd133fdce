#!/usr/bin/env bash
# Stage-1 convergence run under a restart supervisor.
#
# The remote-TPU tunnel client pins every host->device transfer in host RAM
# for process lifetime (verified: .delete()/gc free nothing), so a multi-hour
# training run leaks ~the bytes it ships and OOM-kills the 125 GB host.
# The trainer self-monitors (-max_host_gb) and exits 75 at an epoch boundary
# after saving; this loop re-invokes it with -resume until it finishes for a
# real reason (early stop, nepochs, error).
#
# Usage: scripts/run_stage1_convergence.sh [extra trainer args...]
set -u
LOGDIR=${LOGDIR:-results/convergence/vqvae}
DATA=${DATA:-/tmp/conv/train}
VAL=${VAL:-/tmp/conv/val}
WATERMARK=${WATERMARK:-55}

while :; do
  python -m codlad_tpu.cli.train_vqvae \
    -logdir "$LOGDIR" -data_dir "$DATA" -val_dir "$VAL" \
    -dataset PED -train_section vqvae -seed 12345 \
    -batch_size 16 -nepochs "${NEPOCHS:-40}" -save_every_epochs 5 \
    -lr 1e-3 -bf16 -quantize_type vqvae -embed_dim 36 -vqdim 3 \
    -codebook_size 512 \
    -max_epochs_no_improve 6 -max_host_gb "$WATERMARK" -resume "$@"
  rc=$?
  if [ "$rc" -ne 75 ]; then
    echo "[supervisor] trainer exited rc=$rc — done"
    exit "$rc"
  fi
  echo "[supervisor] rc=75 (host-RSS watermark) — restarting with -resume"
done
