#!/usr/bin/env bash
# Standalone single-device GAN baseline (reference run-standalone.sh analogue).
set -euo pipefail
cd "$(dirname "$0")"
source ./shared-args.sh

exec python -m mdgan_tpu.cli.train \
  --mode standalone \
  --dataset "$dataset" \
  --epochs "$epochs" \
  --local_epochs "$local_epochs" \
  --batch_size "$batch_size" \
  --generator_lr "$generator_lr" \
  --discriminator_lr "$discriminator_lr" \
  --log_interval "$log_interval" \
  --seed "$seed" \
  --beta_1 "$beta_1" \
  --beta_2 "$beta_2" \
  --chunk_size "$chunk_size" \
  --compute_dtype "$compute_dtype" \
  "$@"
