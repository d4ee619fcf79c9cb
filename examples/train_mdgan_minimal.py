"""Minimal MD-GAN training through the library API (no CLI).

Trains 1 generator against 8 discriminators on CIFAR-10 (synthetic fallback
if raw files are absent) for 500 rounds, swaps once, and writes a sample grid.

    python examples/train_mdgan_minimal.py

Every knob has a flag with the defaults above, so the same file doubles as a
tiny smoke run (tests/test_examples.py exercises it that way):

    python examples/train_mdgan_minimal.py --dataset SyntheticMNIST \
        --rounds 10 --chunk_size 5 --num_workers 2 --batch_size 2
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from mdgan_tpu import MDGANEngine, TrainConfig, get_dataset
from mdgan_tpu.data.partitioner import shard_data
from mdgan_tpu.data.sampler import ShardSampler
from mdgan_tpu.obs.images import save_image_grid
from mdgan_tpu.ops.losses import denormalize_to_unit
from mdgan_tpu.utils.compilation_cache import enable_compilation_cache


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="CIFAR10")
    p.add_argument("--rounds", type=int, default=500)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--chunk_size", type=int, default=100)
    p.add_argument("--swap_interval", type=int, default=250)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--out", default="mdgan_samples.png")
    args = p.parse_args()

    enable_compilation_cache()
    n_workers = args.num_workers
    cfg = TrainConfig(batch_size=args.batch_size, chunk_size=args.chunk_size,
                      swap_interval=args.swap_interval,
                      compute_dtype=args.compute_dtype)
    spec = get_dataset(args.dataset)
    data, _ = spec.load("data")
    shards_np, _ = shard_data(data, n_workers, iid=True, seed=0)

    engine = MDGANEngine(spec, cfg, num_workers=n_workers)
    state = engine.init_state(seed=1)
    shards = engine.shard_data(shards_np)
    sampler = ShardSampler(n_workers, shards_np.shape[1], cfg.batch_size, seed=0)
    swap_rng = np.random.default_rng(1)

    for start in range(0, args.rounds, cfg.chunk_size):
        idx = jnp.asarray(sampler.next_chunk(cfg.chunk_size))
        state, metrics = engine.chunk_fn(cfg.chunk_size)(state, shards, idx)
        metrics = jax.device_get(metrics)
        step = int(state.step)
        print(f"round {step:4d}  d_loss={np.mean(metrics['mean_d_loss'][-1]):.4f}  "
              f"g_feedback_loss={np.mean(metrics['g_feedback_loss'][-1]):.4f}")
        if step % cfg.swap_interval == 0:
            state = engine.swap(state, engine.sample_swap_perm(swap_rng))
            print("  swapped discriminator pairs")

    fakes = engine.sample_fn(64)(state.g, jax.random.key(7))
    save_image_grid(np.asarray(denormalize_to_unit(fakes)), args.out, nrow=8)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
