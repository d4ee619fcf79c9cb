"""Configuration dataclasses for mdgan_tpu.

The reference drives everything through a flat argparse CLI layered under bash
variable files (reference ``src/bootstrap.py:30-51``, ``shared-args.sh``,
``run-distributed.sh:5-11``).  Here the same knobs are typed dataclasses; the
CLI (``mdgan_tpu/cli/train.py``) maps flag names 1:1 onto these fields so the
reference's flag surface (``report/appendix/script_arguments.tex``) is
preserved.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Adam hyperparameters.

    The reference's run scripts never forward ``beta_1`` from
    ``shared-args.sh:14`` into python, so every published run used the argparse
    defaults ``(0.0, 0.999)`` (reference ``src/bootstrap.py:49-50``).  We
    default to those effective values.
    """

    lr: float = 2e-4
    beta_1: float = 0.0
    beta_2: float = 0.999
    eps: float = 1e-8  # torch.optim.Adam default
    # Storage dtypes for the Adam moments ("float32" | "bfloat16"). The round
    # is Adam-bandwidth-bound at small batch (REPORT.md §2: p/mu/nu
    # read+write dominate HBM traffic), so bfloat16 moments cut the traffic
    # floor by a third (24 -> 16 bytes/param/step). Moment *updates* still
    # compute in float32 (the stored bf16 value promotes against the f32
    # gradient); only the stored history rounds. Parity default is float32;
    # the CLI exposes both together as ``--moment_dtype``.
    mu_dtype: str = "float32"
    nu_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset selection and partitioning.

    ``iid=True`` splits a seeded random permutation into N contiguous chunks;
    ``iid=False`` chunks ``arange(size)`` (reference ``src/actors/server.py:46-64``).
    """

    dataset: str = "CIFAR10"  # registry key: MNIST | CIFAR10 | CelebA | Synthetic*
    data_dir: str = "data"
    iid: bool = True
    # Fallback behaviour when the raw dataset files are absent on disk (this
    # environment has no network egress): "synthetic" substitutes a
    # deterministic procedurally-generated dataset with the same shapes;
    # "error" raises.
    fallback: str = "synthetic"
    # Cap on examples loaded (None = full dataset). Useful for tests/benches.
    max_examples: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout.

    ``num_workers`` is N, the number of discriminators (the reference's
    ``world_size - 1``).  The ``workers`` array axis is laid out over however
    many devices participate: with 1 device it is a plain stacked (vmap-style)
    axis; with up to N devices XLA shards it and inserts ICI collectives.
    """

    num_workers: int = 8
    # Number of devices to use (None = all available).
    num_devices: Optional[int] = None
    # Mesh axis names: data-parallel replicas x workers. Replica axis is for
    # scaling batch beyond one chip per worker set (stretch; default 1).
    replica_axis: str = "replica"
    worker_axis: str = "workers"
    num_replicas: int = 1
    # Tensor parallelism for the GENERATOR (beyond-parity; the reference
    # replicates G on the server, server.py:105-120): every G param whose
    # trailing (output-feature) dim divides ``num_tensor`` is sharded over
    # this axis — Megatron-style column parallelism expressed as GSPMD
    # sharding annotations; XLA inserts the activation collectives.  G
    # params AND Adam moments shard, so optimizer memory scales down with
    # the axis.  Default 1 = axis absent, layouts byte-identical to before.
    tensor_axis: str = "tensor"
    num_tensor: int = 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """One MD-GAN (or standalone) training run.

    Field names follow the reference CLI (``src/bootstrap.py:30-51``):
    ``epochs`` is the number of *rounds* (single-batch steps), ``local_epochs``
    the number of discriminator steps per round, ``swap_interval`` the round
    period of the discriminator swap, ``log_interval`` the eval/checkpoint
    period.
    """

    batch_size: int = 10
    epochs: int = 30000
    local_epochs: int = 1
    swap_interval: int = 5000
    log_interval: int = 300
    seed: int = 1

    generator_opt: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    discriminator_opt: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)

    # --- TPU-native knobs (no reference equivalent) ---
    # Steps fused into one on-device lax.scan before returning to host.
    # The host loop clips chunks at swap/log boundaries, so any value is safe.
    chunk_size: int = 100
    # lax.scan unroll factor for the fused chunk: replicates the round body
    # so XLA can pipeline across rounds (tiny per-round programs are
    # launch/latency-bound).  Chunk lengths not divisible by the factor fall
    # back to unroll=1 for that compile.
    scan_unroll: int = 1
    # Computation dtype for conv/matmul paths ("bfloat16" | "float32").
    # Params and Adam state are always float32.
    compute_dtype: str = "bfloat16"
    # Donate state buffers to the jitted step (in-place updates on device).
    donate: bool = True
    # Use Pallas TPU kernels for hot ops where available.
    use_pallas: bool = True
    # Pallas fused-Adam kernel (ops/adam.py). Default off: measured slightly
    # slower than XLA's fused optimizer on v5e for these model sizes (per-leaf
    # kernel-call overhead dominates); kept as an opt-in for larger models.
    fused_adam: bool = False
    # Pallas fused DMA-gather+normalize sampling (ops/sampling.py). Stores
    # shards pre-tiled; measured ~3% faster than the XLA gather on v5e for
    # CIFAR-shape rows. Default off for layout simplicity; rows must be
    # 128-byte aligned (MNIST's 784 falls back automatically).
    pallas_sampling: bool = False
    # Number of dispatched chunks whose metrics are fetched in ONE batched
    # device->host transfer by the background log thread.  On remote/tunneled
    # runtimes each device_get costs a full round trip (~1.5 s measured), so
    # per-chunk fetches cap the sustained rate at 1/latency per chunk;
    # batching M chunks divides that cost by M.  Loss values in the CSVs are
    # bit-identical for any value; only the synthesized per-chunk span
    # timestamps coarsen (M chunks share one measured completion time).
    # 1 = fetch per chunk (the pre-round-3 behaviour).
    metrics_flush: int = 8
    # Swap implementation: "gather" (take(perm) on the stacked axis; any
    # worker/device ratio), "ppermute" (point-to-point collective permute;
    # needs one worker per device), or "auto" (ppermute when eligible).
    swap_impl: str = "auto"
    # Swap the discriminator Adam state along with params. The reference swaps
    # only the state dict (params + BN stats) and leaves each worker's Adam
    # moments in place (reference ``src/actors/worker.py:253-283``), so parity
    # default is False.
    swap_opt_state: bool = False
    # --- straggler tolerance (reference-proposed, unimplemented there) ---
    # The reference proposes (report ``sections/discussion.tex:51-55``) a
    # server-side feedback timeout: proceed with whichever worker feedbacks
    # arrived in time and discard the late ones.  It never implements it.  On
    # a lockstep SPMD mesh there are no real stragglers, so this is built as a
    # seeded *simulation* of that policy: each round every worker's feedback
    # is independently "late" (discarded by the server) with this
    # probability.  Discriminator training is untouched (the drop happens
    # after the worker sent its payload); the generator step averages over
    # the surviving feedbacks, 1/(b*|S|), and the earliest worker (smallest
    # arrival draw) always survives, so |S| >= 1 — exactly the proposal's
    # "at least one feedback received" contract.  0.0 disables the code path
    # entirely (the compiled program is the parity program).
    straggler_rate: float = 0.0

    # --- evaluation ---
    n_samples: int = 5          # reference 5-sample FID (``server.py:82``)
    eval_n_samples: int = 0     # standard-protocol FID sample count (0 = off)
    # Standard-protocol cadence: run the (expensive, eval_n_samples-sized)
    # standard eval on every K-th eval event only — the 5-sample reference
    # logging stays on every eval round.  The final round always gets a
    # standard eval so every run ends with a literature-comparable number.
    # K=1 (default) keeps the round-3 behavior: standard eval on every
    # eval round.
    eval_standard_interval: int = 1
    # Run FID/IS + grid/weights IO on a background thread from a host snapshot
    # of the round-e generator (identical eval outputs; latents are keyed by
    # step).  The reference evaluates inline on the server's round loop
    # (``server.py:336-367``), which at TPU round rates would dominate wall
    # time ~18:1 (REPORT.md §4) — async is the performance-correct default.
    async_eval: bool = True

    # --- io ---
    # Full-state (orbax) checkpoint period in rounds; 0 = only at the end.
    # Reference-style weights-only npz exports still happen every
    # log_interval. Distinct from log_interval because full checkpoints are
    # ~100 MB and eval is cheap.
    checkpoint_interval: int = 3000
    log_dir: str = "logs"
    image_dir: str = "saved_images"
    weights_dir: str = "weights"
    checkpoint_dir: str = "checkpoints"
    resume: bool = False


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Top-level bundle: what to train, on what data, over what mesh."""

    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    mode: str = "mdgan"  # "mdgan" | "standalone"


def k_batches(num_workers: int) -> int:
    """Number of distinct fake batches generated per round.

    ``k = max(floor(ln N), 2)`` — reference ``src/actors/server.py:120``.
    Worker n trains its D on batch ``(n+1) % k`` and produces feedback on
    batch ``n % k`` (reference ``server.py:238-239``).
    """
    import math

    return max(math.floor(math.log(num_workers)), 2) if num_workers > 0 else 2
