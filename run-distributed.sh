#!/usr/bin/env bash
# MD-GAN launch (reference run-distributed.sh analogue).
#
# The reference took a rank set as $1 and spawned one OS process per rank,
# meeting at a TCP rendezvous. Here there are no ranks: the whole topology is
# one SPMD program, so $1 is simply N, the number of discriminators
# (reference world_size - 1). All devices jax sees participate automatically.
set -euo pipefail
cd "$(dirname "$0")"
source ./shared-args.sh

num_workers="${1:-8}"
swap_interval="${swap_interval:-5000}"

exec python -m mdgan_tpu.cli.train \
  --mode mdgan \
  --dataset "$dataset" \
  --num_workers "$num_workers" \
  --epochs "$epochs" \
  --local_epochs "$local_epochs" \
  --batch_size "$batch_size" \
  --generator_lr "$generator_lr" \
  --discriminator_lr "$discriminator_lr" \
  --swap_interval "$swap_interval" \
  --log_interval "$log_interval" \
  --iid "$iid" \
  --seed "$seed" \
  --beta_1 "$beta_1" \
  --beta_2 "$beta_2" \
  --chunk_size "$chunk_size" \
  --compute_dtype "$compute_dtype" \
  "${@:2}"
