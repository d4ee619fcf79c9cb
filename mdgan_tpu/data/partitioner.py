"""Dataset partitioning across discriminator workers.

Rebuilds reference ``src/actors/server.py:46-64`` (``_split_dataset``):
  * IID:     split a seeded random permutation of ``arange(size)`` into N chunks
  * non-IID: split ``arange(size)`` (dataset order, e.g. class-ordered) into N chunks

Chunking follows torch.chunk semantics (chunk size = ceil(size / n); the final
chunks may be smaller or empty), exposed by :func:`torch_chunk_sizes` /
:func:`split_indices` for API parity.  The SPMD engine additionally needs
*equal-size* shards so the per-worker data stacks into one (N, S, H, W, C)
array; :func:`split_indices_equal` floors to ``size // n`` per worker
(dropping at most N-1 trailing samples — a documented divergence).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def torch_chunk_sizes(size: int, n: int) -> List[int]:
    """Sizes produced by ``torch.chunk(arange(size), n)``.

    torch uses ceil-size chunks and may return *fewer* than n chunks; we pad
    with zeros so callers always see n entries.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    chunk = -(-size // n)  # ceil
    sizes = []
    remaining = size
    for _ in range(n):
        take = min(chunk, max(remaining, 0))
        sizes.append(take)
        remaining -= take
    return sizes


def permutation(size: int, iid: bool, seed: int = 0) -> np.ndarray:
    """The index order that gets chunked: seeded randperm (IID) or arange."""
    if iid:
        rng = np.random.default_rng(seed)
        return rng.permutation(size).astype(np.int64)
    return np.arange(size, dtype=np.int64)


def split_indices(size: int, n: int, iid: bool, seed: int = 0) -> List[np.ndarray]:
    """Reference-parity split: torch.chunk of the (possibly permuted) indices."""
    idx = permutation(size, iid, seed)
    out, start = [], 0
    for s in torch_chunk_sizes(size, n):
        out.append(idx[start : start + s])
        start += s
    return out


def split_indices_equal(size: int, n: int, iid: bool, seed: int = 0) -> np.ndarray:
    """Equal-size split for the stacked SPMD layout: (n, size // n) int64.

    Same ordering as :func:`split_indices`; up to n-1 trailing samples of the
    permutation are dropped so shards stack.
    """
    if size < n:
        raise ValueError(f"dataset of {size} examples cannot feed {n} workers")
    shard = size // n
    idx = permutation(size, iid, seed)[: shard * n]
    return idx.reshape(n, shard)


def shard_data(data: np.ndarray, n: int, iid: bool, seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Materialize per-worker data shards.

    Returns (shards, indices): shards is (n, S, *data.shape[1:]) with
    S = len(data) // n; indices is the (n, S) map back into the full dataset.
    """
    idx = split_indices_equal(len(data), n, iid, seed)
    flat = idx.reshape(-1)
    if data.nbytes >= 64 * 1024 * 1024:  # big datasets: threaded native gather
        from mdgan_tpu.data import native

        gathered = native.gather_rows(data, flat)
        if gathered is not None:
            return gathered.reshape(idx.shape + data.shape[1:]), idx
    return data[flat].reshape(idx.shape + data.shape[1:]), idx
