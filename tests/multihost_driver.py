"""One MD-GAN chunk under a REAL 2-process jax.distributed runtime.

Each process is launched by ``tests/test_multihost.py`` with 4 virtual CPU
devices; the two join at a TCP coordinator via
``mdgan_tpu.core.distributed.maybe_initialize`` (the rebuild's analogue of the
reference's multi-machine rendezvous — reference ``run-distributed.sh:5-11``,
``bootstrap.py:57-68``) and execute the SAME SPMD chunk over the global
8-device mesh.  Results are written as JSON for cross-process / vs-single-
process equality checks.

Usage: python multihost_driver.py <process_id> <coordinator_port> <out.json>
"""

import json
import os
import sys


def main() -> None:
    process_id, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mdgan_tpu.core.distributed import maybe_initialize

    assert maybe_initialize(f"localhost:{port}", num_processes=2,
                            process_id=process_id)
    assert jax.process_count() == 2
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    import numpy as np

    from mdgan_tpu.core import mesh as mesh_lib
    from mdgan_tpu.core.config import MeshConfig, TrainConfig
    from mdgan_tpu.core.registry import get as get_spec
    from mdgan_tpu.data.partitioner import shard_data
    from mdgan_tpu.data.sampler import ShardSampler
    from mdgan_tpu.engine.mdgan import MDGANEngine

    n, chunk = 8, 3
    cfg = TrainConfig(batch_size=2, chunk_size=chunk, compute_dtype="float32",
                      donate=False)
    mesh_cfg = MeshConfig(num_workers=n, num_replicas=1)
    mesh = mesh_lib.make_mesh(mesh_cfg)

    spec = get_spec("SyntheticMNIST")
    data, _ = spec.load("data", max_examples=64)
    shards_np, _ = shard_data(data, n, iid=True, seed=0)
    eng = MDGANEngine(spec, cfg, num_workers=n, mesh=mesh, mesh_cfg=mesh_cfg)
    st = eng.init_state(seed=0)
    shards = eng.shard_data(shards_np)
    sampler = ShardSampler(n, shards_np.shape[1], cfg.batch_size, seed=0)

    idx = np.asarray(sampler.next_chunk(chunk))
    st, metrics = eng.chunk_fn(chunk)(st, shards, idx)
    st = eng.swap(st, eng.sample_swap_perm(np.random.default_rng(0)))

    # gather worker-sharded results to every process (jit identity with a
    # replicated out_sharding = XLA all-gather over the mesh)
    rep = mesh_lib.replicated(mesh)
    gather = jax.jit(lambda x: x, out_shardings=rep)
    d_loss = np.asarray(jax.device_get(gather(metrics["mean_d_loss"])))
    g_leaves = [np.asarray(jax.device_get(gather(l)))
                for l in jax.tree.leaves(st.g.params)]
    d_first = np.asarray(jax.device_get(gather(jax.tree.leaves(st.d.params)[0])))

    with open(out_path, "w") as f:
        json.dump({
            "process": process_id,
            "step": int(jax.device_get(gather(st.step))),
            "mean_d_loss": d_loss.tolist(),
            "g_param_sums": [float(np.float64(l.sum())) for l in g_leaves],
            "g_first_values": g_leaves[0].ravel()[:32].tolist(),
            "d_first_sum": float(np.float64(d_first.sum())),
        }, f)
    print(f"process {process_id}: OK", flush=True)


if __name__ == "__main__":
    main()
