#!/usr/bin/env bash
# Stage-2 latent diffusion, PED recipe (reference README.md:127-139):
# lr 3e-4, warmup 80k, 1.2M-step schedule to final lr 1e-5, global batch 128
# data-parallel over all available TPU chips.
python -m codlad_tpu.cli.train_latent \
  --feature_dir features/PED_train --val_dir features/PED_valid \
  --exp results/latent_ped --model diffusion --backbone mpnn_diffusion \
  --latent_size 3 --stats_name PED_N6 \
  --lr 3e-4 --warmup 80000 --schedule_steps 1200000 --final_lr 1e-5 \
  --batch_size 128 --diffusion_steps 1000 --grad_clip 1.0 "$@"
