"""Checkpoint / resume.

The reference only *saves* weights (generator every ``log_interval`` —
``src/actors/server.py:366-367, 372-375``; discriminators at exit —
``worker.py:289-293``) and has no resume path (SURVEY.md §5.4).  This module
is the strict superset: orbax checkpoints of the FULL training state
(generator + stacked discriminators, both Adam states, BN stats, PRNG key,
step, data-sampler cursor, host swap-RNG state), restorable mid-run with
bit-identical continuation (chunking invariance is tested in
tests/test_mdgan_engine.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _encode_keys(tree):
    """Typed PRNG keys are not serializable; ship raw key data instead.

    The key data is materialized as NUMPY: ``jax.device_get`` leaves typed
    keys as host-local single-device jax Arrays (numpy has no prng dtype),
    which multi-host orbax refuses to serialize — a host numpy array is
    treated as replicated and written by the primary process."""
    def enc(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return {"__prng_key_data__": np.asarray(
                jax.device_get(jax.random.key_data(x)))}
        return x

    return jax.tree.map(enc, tree, is_leaf=lambda x: isinstance(x, jax.Array))


def _decode_keys(tree):
    def is_marker(x):
        return isinstance(x, dict) and set(x.keys()) == {"__prng_key_data__"}

    def dec(x):
        if is_marker(x):
            return jax.random.wrap_key_data(x["__prng_key_data__"])
        return x

    return jax.tree.map(dec, tree, is_leaf=is_marker)


class CheckpointManager:
    """Full-state checkpointing with retention, plus reference-style
    weights-only exports."""

    def __init__(self, directory, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state, sampler_state: Optional[Dict] = None,
             host_rng_state: Optional[Dict] = None) -> None:
        import flax.serialization

        # to_state_dict turns struct dataclasses into plain name-keyed dicts so
        # the on-disk layout is independent of python container types.
        payload = {"state": flax.serialization.to_state_dict(
            _encode_keys(jax.device_get(state)))}
        if sampler_state is not None:
            payload["sampler"] = dict(sampler_state)
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        # saves run asynchronously; wait only where consistency requires it
        # (restore/close) so training never blocks on checkpoint IO
        if host_rng_state is not None:
            # kept beside (not inside) the orbax step dir: saves are async and
            # the step dir only appears at finalize
            meta = self.directory / f"host_rng_{step}.json"
            meta.write_text(json.dumps(host_rng_state, default=int))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None
                ) -> Tuple[Any, Optional[Dict], Optional[Dict], int]:
        """Returns (state, sampler_state, host_rng_state, step)."""
        import flax.serialization

        self._mgr.wait_until_finished()
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        # sampler payload shape is unknown to the template; restore loosely,
        # then map the name-keyed dict back onto the dataclass structure.
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(None))
        encoded_template = _encode_keys(jax.device_get(state_template))
        state = _decode_keys(flax.serialization.from_state_dict(
            encoded_template, restored["state"]))
        sampler = restored.get("sampler")
        rng_file = self.directory / f"host_rng_{step}.json"
        if not rng_file.exists():  # pre-async layout compatibility
            rng_file = self.directory / str(step) / "host_rng.json"
        host_rng = json.loads(rng_file.read_text()) if rng_file.exists() else None
        return state, sampler, host_rng, step

    def wait_until_finished(self) -> None:
        """Block until every scheduled (async) save is finalized on disk."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_weights_only(path, params, stats=None) -> None:
    """Reference-style weights export (``generator_<epoch>.pt`` analogue):
    a single npz of flattened param (and BN-stat) leaves."""
    import flax

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = flax.traverse_util.flatten_dict({"params": jax.device_get(params)}, sep="/")
    if stats:
        flat.update(flax.traverse_util.flatten_dict(
            {"batch_stats": jax.device_get(stats)}, sep="/"))
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_weights_only(path):
    """Inverse of :func:`save_weights_only` -> (params, stats)."""
    import flax

    flat = dict(np.load(Path(path)))
    tree = flax.traverse_util.unflatten_dict(flat, sep="/")
    return tree.get("params", {}), tree.get("batch_stats", {})


def host_rng_state(rng: np.random.Generator) -> Dict:
    return rng.bit_generator.state


def restore_host_rng(state: Dict) -> np.random.Generator:
    rng = np.random.default_rng(0)
    rng.bit_generator.state = state
    return rng
