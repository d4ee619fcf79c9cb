"""Dataset/model plugin registry.

The reference selects datasets by dynamically importing
``datasets/<name>.py``, which must export ``Partitioner, Generator,
Discriminator, SHAPE, Z_DIM`` (reference ``src/bootstrap.py:166-180``; contract
documented in ``report/sections/experimental_setup.tex:48-55``).  Here the same
contract is an explicit registry entry; third-party datasets register via
:func:`register`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """Everything the engine needs to train on a dataset.

    Mirrors the reference plugin-module contract:
      * ``shape``  — image shape, stored **NHWC**-style as (H, W, C)
        (the reference uses torch NCHW ``SHAPE=(C,H,W)``; TPU wants NHWC).
      * ``z_dim``  — latent dimension.
      * ``make_generator`` / ``make_discriminator`` — Flax module factories.
      * ``load``   — returns a uint8 array of shape (num_examples, H, W, C)
        plus int labels (labels unused by training, kept for non-IID sorting
        extensions), reading from ``data_dir`` or synthesizing a deterministic
        stand-in when raw files are absent.
    """

    name: str
    shape: Tuple[int, int, int]  # (H, W, C)
    z_dim: int
    make_generator: Callable[[], object]
    make_discriminator: Callable[[], object]
    load: Callable[..., Tuple[object, object]]  # (data_dir, split, fallback, max_examples)


_REGISTRY: Dict[str, DatasetSpec] = {}


def register(spec: DatasetSpec) -> DatasetSpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"dataset {spec.name!r} already registered")
    _REGISTRY[spec.name] = spec
    return spec


def get(name: str) -> DatasetSpec:
    _ensure_builtin()
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown dataset {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def available() -> Tuple[str, ...]:
    _ensure_builtin()
    return tuple(sorted(_REGISTRY))


_BUILTIN_LOADED = False


def _ensure_builtin() -> None:
    """Import built-in dataset modules, which self-register on import."""
    global _BUILTIN_LOADED
    if _BUILTIN_LOADED:
        return
    _BUILTIN_LOADED = True
    from mdgan_tpu.data import builtin  # noqa: F401  (registers MNIST/CIFAR10/CelebA/Synthetic)
