"""mdgan_tpu — a TPU-native MD-GAN framework (JAX/XLA/pjit/Pallas).

A brand-new implementation of the capabilities of the MD-GAN reference
(`owengombas/distributed-gan`): one generator trained against N discriminators,
each holding a private (IID or non-IID) partition of MNIST / CIFAR-10 / CelebA,
with image-gradient "error feedback" aggregated into generator updates and
periodic peer-to-peer discriminator swaps.

Where the reference runs N+1 OS processes exchanging tensors over TCP
(PyTorch c10d/gloo, reference ``src/actors/server.py`` / ``src/actors/worker.py``),
this framework expresses the whole training round as ONE SPMD program on a TPU
mesh: discriminator parameters, optimizer state, and data shards carry a leading
``workers`` axis sharded over the mesh; the generator is replicated; feedback
aggregation is a mesh reduction and the discriminator swap is a sharded gather.
Single-chip (vmap-style stacked axis) and multi-chip (mesh-sharded axis) runs
share the same code path.

Layout:
    core/      config dataclasses, plugin registry, PRNG discipline, mesh setup
    data/      dataset loading (MNIST/CIFAR-10/CelebA + synthetic), partitioner, sampler
    models/    Flax GAN pairs: MLP-GAN (MNIST), DCGAN-32 (CIFAR-10), DCGAN-64 (CelebA)
    ops/       losses and Pallas TPU kernels for hot ops
    parallel/  mesh/sharding helpers, swap permutations
    engine/    standalone trainer, MD-GAN SPMD trainer, host train loop
    metrics/   FID / Inception Score with pluggable feature network
    obs/       span (per-op timing) CSV logs, image grids
    cli/       train / generate / analyze / convert_weights entry points
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (kept lazy so `import mdgan_tpu` stays cheap)."""
    lazy = {
        "TrainConfig": "mdgan_tpu.core.config",
        "DataConfig": "mdgan_tpu.core.config",
        "MeshConfig": "mdgan_tpu.core.config",
        "RunConfig": "mdgan_tpu.core.config",
        "MDGANEngine": "mdgan_tpu.engine.mdgan",
        "StandaloneEngine": "mdgan_tpu.engine.standalone",
        "MDGANTrainer": "mdgan_tpu.engine.train_loop",
        "StandaloneTrainer": "mdgan_tpu.engine.train_loop",
        "get_dataset": "mdgan_tpu.core.registry",
    }
    if name == "get_dataset":
        from mdgan_tpu.core.registry import get

        return get
    if name in lazy:
        import importlib

        return getattr(importlib.import_module(lazy[name]), name)
    raise AttributeError(name)
