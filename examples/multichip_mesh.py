"""MD-GAN over a device mesh: workers sharded, optional replica/tensor axes.

Works on real multi-chip hardware or, for a dry run anywhere, on a virtual
CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_mesh.py --force_cpu
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--force_cpu", action="store_true",
                   help="run on the virtual CPU mesh (set XLA_FLAGS first)")
    p.add_argument("--num_workers", type=int, default=None)
    p.add_argument("--num_replicas", type=int, default=1)
    p.add_argument("--num_tensor", type=int, default=1,
                   help="generator tensor parallelism (column-sharded G "
                        "params + Adam moments over a third mesh axis)")
    args = p.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mdgan_tpu import MDGANEngine, MeshConfig, TrainConfig, get_dataset
    from mdgan_tpu.core import mesh as mesh_lib
    from mdgan_tpu.data.partitioner import shard_data
    from mdgan_tpu.data.sampler import ShardSampler

    n_dev = len(jax.devices())
    n_workers = args.num_workers or max(
        1, n_dev // (args.num_replicas * args.num_tensor))
    mesh_cfg = MeshConfig(num_workers=n_workers,
                          num_replicas=args.num_replicas,
                          num_tensor=args.num_tensor)
    mesh = mesh_lib.make_mesh(mesh_cfg)
    print(f"devices: {n_dev}, mesh: {dict(mesh.shape)}, workers: {n_workers}")

    cfg = TrainConfig(batch_size=4, chunk_size=10, compute_dtype="float32",
                      donate=False)
    spec = get_dataset("SyntheticMNIST")
    data, _ = spec.load("data", max_examples=max(256, n_workers * 16))
    shards_np, _ = shard_data(data, n_workers, iid=True, seed=0)

    engine = MDGANEngine(spec, cfg, num_workers=n_workers,
                         mesh=mesh, mesh_cfg=mesh_cfg)
    state = engine.init_state(seed=0)
    shards = engine.shard_data(shards_np)
    sampler = ShardSampler(n_workers, shards_np.shape[1], cfg.batch_size, seed=0)

    for _ in range(3):
        idx = jnp.asarray(sampler.next_chunk(cfg.chunk_size))
        state, metrics = engine.chunk_fn(cfg.chunk_size)(state, shards, idx)
        metrics = jax.device_get(metrics)
        print(f"round {int(state.step):3d}  "
              f"d_loss={np.mean(metrics['mean_d_loss'][-1]):.4f}")

    if n_workers % 2 == 0 and n_workers > 1:
        state = engine.swap(state, engine.sample_swap_perm(np.random.default_rng(0)))
        print("swap OK (ppermute when one worker per device, gather otherwise)")


if __name__ == "__main__":
    main()
