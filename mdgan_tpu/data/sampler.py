"""Per-worker batch-index sampling.

Rebuilds the reference worker's seeded, shuffled, restart-on-exhaustion
DataLoader (reference ``src/actors/worker.py:81-89, 161-167``): each worker
draws batches *without replacement* from its private shard, reshuffling when
the shard is exhausted.

The sampler runs on the **host** at scan-chunk granularity: for a chunk of T
fused steps it emits an int32 index array of shape (T, N, b) that the jitted
scan consumes.  This keeps epoch-boundary reshuffles out of the compiled step
(no data-dependent control flow on device) and exactly reproduces DataLoader
semantics.  State (per-worker permutation + cursor + generation counter) is
tiny and checkpointable.
"""

from __future__ import annotations

import dataclasses
import numpy as np


@dataclasses.dataclass
class SamplerState:
    perms: np.ndarray  # (N, S) int32 — current epoch permutation per worker
    pos: np.ndarray    # (N,)   int64 — cursor into each permutation
    epoch: np.ndarray  # (N,)   int64 — reshuffle generation per worker
    seed: int


class ShardSampler:
    """Without-replacement batch sampler over N equal shards of size S."""

    def __init__(self, num_workers: int, shard_size: int, batch_size: int, seed: int = 0):
        if batch_size > shard_size:
            raise ValueError(f"batch_size {batch_size} > shard size {shard_size}")
        self.n = num_workers
        self.s = shard_size
        self.b = batch_size
        self.state = SamplerState(
            perms=np.stack([self._perm(seed, w, 0) for w in range(num_workers)]),
            pos=np.zeros(num_workers, np.int64),
            epoch=np.zeros(num_workers, np.int64),
            seed=seed,
        )

    def _perm(self, seed: int, worker: int, epoch: int) -> np.ndarray:
        rng = np.random.default_rng((seed, worker, epoch))
        return rng.permutation(self.s).astype(np.int32)

    def next_chunk(self, num_steps: int) -> np.ndarray:
        """Indices for the next `num_steps` rounds: (T, N, b) int32.

        Epoch semantics: a batch never straddles an epoch boundary — if fewer
        than b indices remain, the tail is DROPPED and a fresh permutation
        starts.  (The reference's DataLoader has drop_last=False, so it would
        yield that short batch — and then crash, because the worker's BCE
        labels are fixed at length b (``worker.py:114, 199``).  Dropping the
        tail is the only well-defined behavior; reference experiment configs
        all have shard sizes divisible by b and never hit it.)
        """
        st = self.state
        out = np.empty((num_steps, self.n, self.b), np.int32)
        for w in range(self.n):
            pos, epoch, perm = int(st.pos[w]), int(st.epoch[w]), st.perms[w]
            for t in range(num_steps):
                if pos + self.b > self.s:
                    epoch += 1
                    perm = self._perm(st.seed, w, epoch)
                    pos = 0
                out[t, w] = perm[pos : pos + self.b]
                pos += self.b
            st.pos[w], st.epoch[w], st.perms[w] = pos, epoch, perm
        return out

    # --- checkpointing ---
    def state_dict(self) -> dict:
        return {
            "perms": self.state.perms,
            "pos": self.state.pos,
            "epoch": self.state.epoch,
            "seed": np.int64(self.state.seed),
        }

    def load_state_dict(self, d: dict) -> None:
        self.state = SamplerState(
            perms=np.asarray(d["perms"], np.int32),
            pos=np.asarray(d["pos"], np.int64),
            epoch=np.asarray(d["epoch"], np.int64),
            seed=int(d["seed"]),
        )
