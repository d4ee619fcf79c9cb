"""Discriminator-swap implementations over the mesh.

The reference's swap is a TensorDict state-dict exchange between worker pairs
over TCP (reference ``src/actors/worker.py:239-284``), orchestrated by
server-sampled random pairs (``server.py:321-332``).  Two TPU-native forms:

  * **gather** (default, ``MDGANEngine.swap_fn``): ``take(perm)`` on the
    stacked worker axis.  Works for ANY worker/device ratio; XLA lowers it to
    an all-gather + local select when sharded.  Perm is a traced array, so one
    compilation serves every pairing.
  * **ppermute** (here): an explicit ``shard_map`` + ``lax.ppermute`` with a
    static pairing — point-to-point ICI sends only (each chip ships its
    2.5 MB of discriminator state directly to its partner; no all-gather
    fan-in).  Requires one worker per device on the ``workers`` mesh axis and
    recompiles per distinct pairing (swaps are rare — every ``swap_interval``
    = 5000 rounds in the reference config — and pairings are cached).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


@functools.lru_cache(maxsize=64)
def _ppermute_fn(mesh: Mesh, axis: str, perm: Tuple[int, ...], treedef_token):
    pairs = tuple((src, dst) for dst, src in enumerate(perm) if src != dst)
    # perm[d] = partner whose state lands on d  =>  ppermute pair (src, dst)

    def shard_fn(leaf):
        return jax.lax.ppermute(leaf, axis, pairs) if pairs else leaf

    spec = P(axis)

    def mapped(tree):
        return jax.tree.map(shard_fn, tree)

    return jax.jit(
        jax.shard_map(mapped, mesh=mesh, in_specs=spec, out_specs=spec,
                      check_vma=False)
    )


def swap_ppermute(d_tree, perm: np.ndarray, mesh: Mesh, axis: str):
    """Exchange stacked-worker state along an involutive permutation with
    point-to-point collective permutes.

    ``perm`` must be an involution (random non-overlapping pairs — the only
    pattern the reference produces) and the worker axis must have exactly one
    worker per device.
    """
    n = len(perm)
    axis_size = mesh.shape[axis]
    if axis_size != n:
        raise ValueError(
            f"ppermute swap needs one worker per device on axis {axis!r}: "
            f"axis size {axis_size} != {n} workers (use the gather swap instead)"
        )
    if not np.array_equal(perm[perm], np.arange(n)):
        raise ValueError("swap permutation must be an involution (pairing)")
    fn = _ppermute_fn(mesh, axis, tuple(int(p) for p in perm), None)
    # non-stacked leaves (e.g. the Adam step counter) pass through untouched
    leaves, treedef = jax.tree.flatten(d_tree)
    stacked_idx = [i for i, l in enumerate(leaves)
                   if hasattr(l, "ndim") and l.ndim >= 1 and l.shape[0] == n]
    swapped = fn([leaves[i] for i in stacked_idx])
    out = list(leaves)
    for i, s in zip(stacked_idx, swapped):
        out[i] = s
    return jax.tree.unflatten(treedef, out)
