"""Multi-host initialization.

The reference scales across machines by launching its script with different
rank subsets per machine, meeting at a TCP rendezvous (reference
``run-distributed.sh`` usage, ``bootstrap.py:57-59``).  The TPU-native
equivalent is ``jax.distributed.initialize``: each host joins the runtime,
``jax.devices()`` spans every chip in the slice (or multi-slice over DCN), and
the SAME single-program engine code runs — the mesh simply gets bigger.  No
actor/rank logic exists anywhere above this call.

Data placement note for multi-host: build each host's worker shards with
``partitioner.shard_data`` for the GLOBAL worker set and feed
``jax.make_array_from_process_local_data`` (or device_put per local shard) so
each host only materializes its local slice; the stacked-array engine is
agnostic to how the arrays were assembled.

The FULL ``MDGANTrainer`` host loop (span/worker CSVs, FID/IS eval, image
grids, checkpoints) runs multi-host: every process executes the same
deterministic loop and dispatches every jitted global computation in
lockstep; chunk metrics are all-gathered to a replicated layout so process 0
can fetch them; host IO happens on process 0 only; checkpoints are saved by
all processes through orbax's own multi-host coordination.  Proven
equivalent to a single-process run in ``tests/test_multihost.py`` (bare
engine: ``tests/multihost_driver.py``; full trainer:
``tests/multihost_trainer_driver.py``).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger("mdgan_tpu")


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Join the multi-host runtime if configured; returns True if distributed.

    Configuration comes from the arguments or the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / cloud-TPU metadata, which
    ``jax.distributed.initialize()`` discovers on its own). Single-host runs
    (no coordinator configured) are a no-op.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    on_cloud_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if coordinator_address is None and not on_cloud_tpu_pod:
        return False
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    log.info("multi-host initialized: process %d/%d, %d local of %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return True
