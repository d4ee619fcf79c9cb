"""Full multi-host MDGANTrainer launch — run this SAME script on every host.

The reference scales across machines by launching its script with different
rank subsets per machine, meeting at a TCP rendezvous
(reference ``run-distributed.sh:5-11``, ``bootstrap.py:57-68``).  Here every
host runs the identical program: ``jax.distributed`` joins the hosts, the
trainer drives one lockstep SPMD program over the global mesh, and process 0
writes the CSVs / eval metrics / grids / checkpoints.

On a Cloud TPU pod slice, just run it (coordination auto-discovers).
Elsewhere, point every process at the same coordinator:

    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=0 \
        python examples/multihost_trainer.py     # on host 0
    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=1 \
        python examples/multihost_trainer.py     # on host 1

Local demo without hardware (two processes, 4 virtual CPU devices each):
see ``tests/multihost_trainer_driver.py`` — the pattern this example uses,
proven equivalent to a single-process run in ``tests/test_multihost.py``.
"""

import os
import sys

from mdgan_tpu.core.distributed import maybe_initialize

# The headline experiment config; any flag can be overridden from the command
# line (argparse keeps the LAST occurrence, so trailing sys.argv wins) — e.g.
# ``python examples/multihost_trainer.py --epochs 100 --log_interval 0`` for
# a short smoke run (tests/test_examples.py runs it that way).
DEFAULT_ARGV = [
    "--mode", "mdgan", "--dataset", "CIFAR10", "--num_workers", "8",
    "--epochs", "30000", "--batch_size", "10", "--swap_interval", "5000",
    "--log_interval", "300",
]


def main() -> None:
    maybe_initialize(
        num_processes=int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None,
        process_id=int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None,
    )

    from mdgan_tpu.cli.train import build_parser, config_from_args
    from mdgan_tpu.engine.train_loop import MDGANTrainer

    cfg = config_from_args(build_parser().parse_args(
        DEFAULT_ARGV + sys.argv[1:]))
    trainer = MDGANTrainer(cfg)
    try:
        summary = trainer.train()
    finally:
        trainer.close()
    import jax

    if jax.process_index() == 0:
        print(summary)


if __name__ == "__main__":
    main()
