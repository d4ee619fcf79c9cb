"""PRNG key discipline.

The reference seeds each process with ``seed + rank`` and relies on framework
global RNG state (reference ``src/bootstrap.py:138-145``).  In JAX all
randomness is explicit: one root key per run, split/folded along well-known
lanes so every consumer (init, latents, data shuffling, dropout, swap pairing)
has an independent, reproducible stream that does not depend on how many steps
were fused into a scan chunk.
"""

from __future__ import annotations

import jax

# Stable fold-in tags for the independent random lanes of a run.
INIT_G = 0
INIT_D = 1
LATENT = 2
DATA = 3
DROPOUT = 4
SWAP = 5
EVAL = 6
STRAGGLER = 7  # per-round feedback-arrival draws (straggler simulation)


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def lane(key: jax.Array, tag: int) -> jax.Array:
    """The per-purpose subkey for one of the lanes above."""
    return jax.random.fold_in(key, tag)


def for_step(key: jax.Array, tag: int, step) -> jax.Array:
    """Key for lane `tag` at global step `step` (host int or traced int32).

    Folding the *global* step (not the within-chunk index) keeps streams
    identical regardless of chunking, so resume and re-chunking reproduce the
    same run bit-for-bit.
    """
    return jax.random.fold_in(lane(key, tag), step)


def for_worker(key: jax.Array, worker_index) -> jax.Array:
    """Per-discriminator-worker key (mirrors reference's per-rank seeding)."""
    return jax.random.fold_in(key, worker_index)
