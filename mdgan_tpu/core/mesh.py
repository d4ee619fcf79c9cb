"""Device mesh setup and sharding helpers.

The reference's L0 layer is a torch.distributed TCP process group with explicit
send/recv choreography (reference ``src/bootstrap.py:57-68``,
``src/actors/server.py:89-100``).  The TPU-native replacement is a
``jax.sharding.Mesh``: the ``workers`` array axis (leading axis of stacked
discriminator params / optimizer state / data shards) is laid out over the
mesh, XLA inserts ICI collectives for the feedback reduction and the swap
gather, and zero explicit communication code exists anywhere in the engine.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mdgan_tpu.core.config import MeshConfig


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (replica, workers[, tensor]) mesh.

    The number of devices on the worker axis need not equal ``num_workers``:
    with fewer devices each device holds a contiguous slab of workers (the
    stacked axis is simply sharded), and with one device the whole stack is
    local — same program either way.

    ``num_tensor > 1`` appends a minor ``tensor`` axis for generator tensor
    parallelism (see :func:`generator_sharding`); it is the mesh's
    fastest-varying axis so tensor collectives ride the closest ICI links
    (the scaling-book layout rule: put the chattiest axis innermost).
    """
    if devices is None:
        devices = jax.devices()
    n = cfg.num_devices or len(devices)
    devices = list(devices)[:n]
    n_rep, n_t = cfg.num_replicas, cfg.num_tensor
    if n % (n_rep * n_t) != 0:
        raise ValueError(
            f"{n} devices not divisible by num_replicas={n_rep} "
            f"* num_tensor={n_t}")
    n_work = n // (n_rep * n_t)
    # Worker-axis devices must evenly divide the worker count so the stacked
    # leading axis shards cleanly.
    if cfg.num_workers % n_work != 0:
        # Fall back to the largest divisor of num_workers <= n_work.
        d = n_work
        while cfg.num_workers % d != 0:
            d -= 1
        n_work = d
    used = n_rep * n_work * n_t
    if used < n:
        import logging

        logging.getLogger("mdgan_tpu").warning(
            "mesh uses %d of %d devices (%d workers not divisible by the "
            "worker-axis size); %d devices idle", used, n, cfg.num_workers,
            n - used)
    if n_t > 1:
        dev_grid = np.asarray(devices[:used]).reshape(n_rep, n_work, n_t)
        return Mesh(dev_grid,
                    (cfg.replica_axis, cfg.worker_axis, cfg.tensor_axis))
    dev_grid = np.asarray(devices[:used]).reshape(n_rep, n_work)
    return Mesh(dev_grid, (cfg.replica_axis, cfg.worker_axis))


def worker_sharding(mesh: Mesh, cfg: MeshConfig) -> NamedSharding:
    """Sharding for arrays with a leading ``workers`` axis (stacked D state)."""
    return NamedSharding(mesh, P(cfg.worker_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for fully-replicated arrays (generator params, scalars)."""
    return NamedSharding(mesh, P())


def generator_sharding(mesh: Mesh, cfg: MeshConfig, leaf) -> NamedSharding:
    """Tensor-parallel placement for one generator-state leaf.

    When the mesh carries a ``tensor`` axis, any leaf whose trailing dim
    (Dense/conv output features, bias/BN channel vectors, and the Adam
    moments mirroring them) divides the axis size shards over it —
    Megatron-style column parallelism as a pure GSPMD annotation; XLA
    propagates the sharding through the forward/VJP and inserts the
    activation collectives.  Everything else (scalars, indivisible dims,
    meshes without the axis) replicates, which is exactly the pre-tensor
    layout — the reference server's replicated generator
    (``server.py:105-120``)."""
    t = mesh.shape.get(cfg.tensor_axis, 1)
    nd = getattr(leaf, "ndim", 0)
    if t > 1 and nd >= 1 and leaf.shape[-1] % t == 0:
        return NamedSharding(
            mesh, P(*([None] * (nd - 1)), cfg.tensor_axis))
    return NamedSharding(mesh, P())


def shard_generator(tree, mesh: Mesh, cfg: Optional[MeshConfig]):
    """Place a generator NetState pytree under :func:`generator_sharding`
    (fully replicated when no MeshConfig names a tensor axis)."""
    if cfg is None:
        return replicate(tree, mesh)
    return jax.tree.map(
        lambda a: global_put(a, generator_sharding(mesh, cfg, a)), tree)


def global_put(a, sh: NamedSharding):
    """``device_put`` that also works when the sharding spans processes.

    Multi-host (``jax.distributed``-initialized) runs cannot ``device_put``
    onto non-addressable devices; instead each process contributes its local
    shards via ``jax.make_array_from_callback`` from an identical host copy
    (every process computes the same init/data — reference equivalence: each
    machine runs the same bootstrap, ``bootstrap.py:57-68``).  Typed PRNG keys
    travel as raw key-data and are re-wrapped under jit.
    """
    if jax.process_count() == 1:
        return jax.device_put(a, sh)
    if hasattr(a, "dtype") and jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key):
        kd = np.asarray(jax.device_get(jax.random.key_data(a)))
        g = jax.make_array_from_callback(kd.shape, sh, lambda i: kd[i])
        return jax.jit(jax.random.wrap_key_data, out_shardings=sh)(g)
    host = np.asarray(jax.device_get(a))
    return jax.make_array_from_callback(host.shape, sh, lambda i: host[i])


def shard_stacked(tree, mesh: Mesh, cfg: MeshConfig):
    """Place a pytree whose leaves all have a leading ``workers`` axis."""
    sh = worker_sharding(mesh, cfg)
    return jax.tree.map(lambda a: global_put(a, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda a: global_put(a, sh), tree)
