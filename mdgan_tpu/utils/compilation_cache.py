"""Persistent XLA compilation cache.

First-compile of the fused train chunk or the InceptionV3 eval graph costs
tens of seconds to minutes; enabling jax's persistent cache makes every
subsequent process start warm.  Called by the CLI, bench, and test harness.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    path = Path(cache_dir or os.environ.get(
        "MDGAN_TPU_COMPILE_CACHE",
        Path.home() / ".cache" / "mdgan_tpu_xla",
    ))
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return str(path)
