"""Training CLI.

Mirrors the reference flag surface (``src/bootstrap.py:30-51`` for distributed,
``src/standalone_gan.py:58-72`` for standalone; documented in the reference
report ``appendix/script_arguments.tex``), dropping only the flags that have no
meaning in the single-SPMD-program world (``--backend``, ``--ranks``,
``--master_addr/port``, ``--network_interface``) and replacing ``--world_size``
with ``--num_workers`` (= world_size - 1; the parameter server is not a
process here).

Usage:
    python -m mdgan_tpu.cli.train --mode mdgan --dataset CIFAR10 \
        --num_workers 8 --epochs 30000 --batch_size 10 --swap_interval 5000
    python -m mdgan_tpu.cli.train --mode standalone --dataset MNIST --epochs 1000
"""

from __future__ import annotations

import argparse
import json
import logging

from mdgan_tpu.core.config import (
    DataConfig, MeshConfig, OptimizerConfig, RunConfig, TrainConfig,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--mode", choices=["mdgan", "standalone"], default="mdgan")
    p.add_argument("--dataset", type=str, default="CIFAR10")
    p.add_argument("--num_workers", type=int, default=8,
                   help="number of discriminators N (reference world_size - 1)")
    p.add_argument("--num_replicas", type=int, default=1,
                   help="data-parallel replica mesh axis (batch sharding)")
    p.add_argument("--num_tensor", type=int, default=1,
                   help="tensor-parallel mesh axis for the generator "
                        "(shards G params + Adam moments over output "
                        "channels; XLA inserts the activation collectives)")
    p.add_argument("--epochs", type=int, default=30000,
                   help="training rounds (single-batch steps, reference naming)")
    p.add_argument("--swap_interval", type=int, default=5000)
    p.add_argument("--local_epochs", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--log_interval", type=int, default=300)
    p.add_argument("--checkpoint_interval", type=int, default=3000,
                   help="full-state checkpoint period (0 = only final)")
    p.add_argument("--generator_lr", type=float, default=2e-4)
    p.add_argument("--discriminator_lr", type=float, default=2e-4)
    p.add_argument("--iid", type=int, default=1)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--beta_1", type=float, default=0.0)
    p.add_argument("--beta_2", type=float, default=0.999)
    p.add_argument("--moment_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="storage dtype for BOTH Adam moments (mu and nu) of "
                        "both nets. bfloat16 cuts the Adam HBM-traffic floor "
                        "by a third (REPORT.md §2); updates still compute in "
                        "float32. float32 (default) is the parity setting")
    p.add_argument("--n_samples", type=int, default=5)
    p.add_argument("--eval_n_samples", type=int, default=0,
                   help="standard-protocol FID/IS sample count (0 = off)")
    p.add_argument("--eval_standard_interval", type=int, default=1,
                   help="run the standard-protocol eval on every K-th eval "
                        "event only (plus the final round); the 5-sample "
                        "reference logging stays on every eval round")
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--download", action="store_true",
                   help="fetch the dataset's raw files (checksum-verified) "
                        "into --data_dir if absent — the reference loaders' "
                        "download=True (CIFAR10.py:37, MNIST.py:42), opt-in. "
                        "Multi-process launches fetch on EVERY process "
                        "(concurrent-safe; correct whether or not --data_dir "
                        "is a shared filesystem) — to avoid the redundant "
                        "egress, pre-place the files once instead")
    p.add_argument("--max_examples", type=int, default=None)
    # TPU-native knobs
    p.add_argument("--chunk_size", type=int, default=100)
    p.add_argument("--metrics_flush", type=int, default=8,
                   help="chunks per batched metrics device->host fetch "
                        "(1 = fetch every chunk)")
    p.add_argument("--scan_unroll", type=int, default=1,
                   help="lax.scan unroll factor for the fused chunk")
    p.add_argument("--compute_dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--no_pallas", action="store_true",
                   help="master switch disabling all Pallas kernels")
    p.add_argument("--fused_adam", action="store_true",
                   help="Pallas fused-Adam kernel (see core/config.py notes)")
    p.add_argument("--pallas_sampling", action="store_true",
                   help="Pallas DMA gather+normalize sampling (pre-tiled shards)")
    p.add_argument("--swap_impl", choices=["auto", "gather", "ppermute"],
                   default="auto",
                   help="discriminator-swap implementation: explicit "
                        "collective permute needs one worker per device on "
                        "the mesh; gather works at any ratio; auto picks "
                        "ppermute when eligible")
    p.add_argument("--straggler_rate", type=float, default=0.0,
                   help="simulate the reference's proposed server-side "
                        "feedback timeout (report discussion.tex:51-55): each "
                        "round every worker's feedback is discarded with this "
                        "probability; the generator averages the survivors "
                        "(at least one always survives). 0 disables")
    p.add_argument("--sync_eval", action="store_true",
                   help="run FID/IS eval inline on the round loop (the "
                        "reference's behaviour) instead of on a background "
                        "thread")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of the first chunks here")
    p.add_argument("--host_metrics", type=str, default=None,
                   help="sample host cpu/mem/net to this CSV (gce_stats analogue)")
    p.add_argument("--log_dir", type=str, default="logs")
    p.add_argument("--image_dir", type=str, default="saved_images")
    p.add_argument("--weights_dir", type=str, default="weights")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    return p


def config_from_args(args: argparse.Namespace) -> RunConfig:
    train = TrainConfig(
        batch_size=args.batch_size,
        epochs=args.epochs,
        local_epochs=args.local_epochs,
        swap_interval=args.swap_interval,
        log_interval=args.log_interval,
        checkpoint_interval=args.checkpoint_interval,
        seed=args.seed,
        generator_opt=OptimizerConfig(lr=args.generator_lr, beta_1=args.beta_1,
                                      beta_2=args.beta_2,
                                      mu_dtype=args.moment_dtype,
                                      nu_dtype=args.moment_dtype),
        discriminator_opt=OptimizerConfig(lr=args.discriminator_lr,
                                          beta_1=args.beta_1, beta_2=args.beta_2,
                                          mu_dtype=args.moment_dtype,
                                          nu_dtype=args.moment_dtype),
        chunk_size=args.chunk_size,
        metrics_flush=args.metrics_flush,
        scan_unroll=args.scan_unroll,
        compute_dtype=args.compute_dtype,
        use_pallas=not args.no_pallas,
        fused_adam=args.fused_adam,
        pallas_sampling=args.pallas_sampling,
        swap_impl=args.swap_impl,
        straggler_rate=args.straggler_rate,
        n_samples=args.n_samples,
        eval_n_samples=args.eval_n_samples,
        eval_standard_interval=args.eval_standard_interval,
        async_eval=not args.sync_eval,
        log_dir=args.log_dir,
        image_dir=args.image_dir,
        weights_dir=args.weights_dir,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
    )
    data = DataConfig(dataset=args.dataset, data_dir=args.data_dir,
                      iid=args.iid == 1, max_examples=args.max_examples)
    mesh = MeshConfig(num_workers=args.num_workers,
                      num_replicas=args.num_replicas,
                      num_tensor=args.num_tensor)
    return RunConfig(train=train, data=data, mesh=mesh, mode=args.mode)


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(message)s")
    from mdgan_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from mdgan_tpu.core.distributed import maybe_initialize

    maybe_initialize()  # no-op on single host
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    if args.download:
        from mdgan_tpu.data.download import ensure_dataset

        ensure_dataset(args.dataset, args.data_dir)
    from mdgan_tpu.engine.train_loop import MDGANTrainer, StandaloneTrainer

    monitor = None
    if args.host_metrics:
        from mdgan_tpu.obs.hostmon import HostMonitor

        monitor = HostMonitor(args.host_metrics).start()
    if args.profile_dir:
        import jax

        jax.profiler.start_trace(args.profile_dir)
    trainer = MDGANTrainer(cfg) if cfg.mode == "mdgan" else StandaloneTrainer(cfg)
    try:
        summary = trainer.train()
    finally:
        trainer.close()
        if args.profile_dir:
            import jax

            jax.profiler.stop_trace()
        if monitor is not None:
            monitor.stop()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
