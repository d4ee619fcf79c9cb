"""Benchmark: MD-GAN rounds/sec on TPU.

Default (no args) prints ONE JSON line for the headline config — MD-GAN
CIFAR-10 with 8 discriminators at the reference's published hyperparameters
(batch 10, local_epochs 1, ``shared-args.sh``):
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

One "step" is one full MD-GAN round: generate k fake batches, N discriminator
Adam updates on private shards, error-feedback VJP aggregation, generator Adam
step.

Baseline: the reference's best measured round rate, 7.63 steps/s — its
2-worker all-local CPU smoke run (median 0.131 s/round, computed from the
committed ``src/logs/mdgan.2.CIFAR10.server.logs.csv``; BASELINE.md).  Its
multi-machine runs are slower (3.6 steps/s at 20 workers, 1.4 at 40), so this
is the most conservative comparison available, taken at a HIGHER worker count
(8 vs 2).

``python bench.py --config all`` additionally times the other BASELINE.json
configs (MNIST 4-worker, CelebA-64 16-worker, FFHQ-128 StyleGAN2 8-worker,
standalone MNIST), one JSON line each.

Every row also carries utilization accounting from the compiled chunk
program's own cost model (``flops_per_round`` / ``bytes_per_round``, and on
known TPUs the derived ``mfu`` / ``hbm_util`` against the chip's public bf16
and HBM peaks) so the REPORT.md §2 roofline claims are auditable from the
committed artifacts.
"""

from __future__ import annotations

import argparse
import json
import time

REFERENCE_STEPS_PER_SEC = 7.63  # 2-worker reference, best published rate

# name -> (dataset, workers, batch, chunk, timed_chunks, max_examples)
CONFIGS = {
    "headline": ("CIFAR10", 8, 10, 500, 6, 50000),
    "mnist4": ("MNIST", 4, 10, 500, 6, 60000),
    "celeba16": ("CelebA", 16, 10, 200, 4, 32000),
    "ffhq128_stylegan": ("FFHQ128", 8, 4, 20, 3, 4000),
    # MXU-ceiling probe, not a parity config: the reference fixes b=10, which
    # under-fills the systolic array (REPORT.md §2 — the parity round is
    # bandwidth-bound on Adam state). b=256/worker shows what the same
    # compiled program family does once conv batches fill the MXU.
    "bigbatch": ("CIFAR10", 8, 256, 50, 4, 50000),
}

# (device_kind substring -> bf16 peak FLOP/s, HBM bytes/s), public per-chip
# figures (jax-ml.github.io/scaling-book roofline numbers), for the MFU /
# HBM-utilization fields (VERDICT r3: make the REPORT §2 roofline auditable
# from committed bench artifacts). Order matters: first substring match wins.
DEVICE_PEAKS = [
    ("v6 lite", 918e12, 1640e9),   # v6e (Trillium)
    ("v5 lite", 197e12, 819e9),    # v5e
    ("v5p", 459e12, 2765e9),
    ("v4", 275e12, 1228e9),
    ("v3", 123e12, 900e9),
    ("v2", 46e12, 700e9),
]


def _utilization_fields(compiled, rounds: int, steps_per_sec: float) -> dict:
    """flops/bytes per round from the compiled executable's own cost model
    (``jax.stages.Compiled.cost_analysis``), plus derived MFU and
    HBM-bandwidth utilization against the chip's public bf16/HBM peaks.

    IMPORTANT loop semantics: XLA's HLO cost analysis visits a while-loop
    (``lax.scan``) body ONCE — trip count is opaque to it — so a chunk
    program of any length reports the flops/bytes of ONE loop body.
    Callers must therefore pass a program whose body covers exactly
    ``rounds`` rounds (the benches use a length-1 chunk: scan trip 1, body
    = one round; validated against a hand FLOP count of the DCGAN round in
    tests).  ``flops`` is the algorithmic count; ``bytes accessed`` is the
    post-fusion analytical operand+output traffic, which OVERCOUNTS real
    HBM traffic (every fusion-boundary tensor is billed even when it stays
    resident), so ``hbm_util`` is an upper bound and can exceed 1 — the
    wall-clock roofline in REPORT.md §2 is the ground truth; these fields
    make it auditable.  Fields degrade to a marker when the backend
    exposes no cost model."""
    import jax

    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # pre-0.5 jax returned [dict]
            ca = ca[0]
        flops, nbytes = float(ca["flops"]), float(ca["bytes accessed"])
    except Exception as e:  # backend without a cost model
        return {"cost_analysis_error": type(e).__name__}
    out = {
        "flops_per_round": round(flops / rounds, 1),
        "bytes_per_round": round(nbytes / rounds, 1),
    }
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak_f, peak_b in DEVICE_PEAKS:
        if sub in kind:
            out["mfu"] = round(flops / rounds * steps_per_sec / peak_f, 5)
            out["hbm_util_analytical"] = round(
                nbytes / rounds * steps_per_sec / peak_b, 4)
            out["peak_flops_per_sec"] = peak_f
            out["peak_hbm_bytes_per_sec"] = peak_b
            break
    return out


def _setup_mdgan(name: str, moment_dtype: str = "float32"):
    """(engine, state, device shards, sampler) for a named kernel config."""
    from mdgan_tpu.core.config import OptimizerConfig, TrainConfig
    from mdgan_tpu.core.registry import get as get_spec
    from mdgan_tpu.data.partitioner import shard_data
    from mdgan_tpu.data.sampler import ShardSampler
    from mdgan_tpu.engine.mdgan import MDGANEngine

    dataset, n_workers, batch, chunk, n_chunks, max_ex = CONFIGS[name]
    opt = OptimizerConfig(mu_dtype=moment_dtype, nu_dtype=moment_dtype)
    cfg = TrainConfig(batch_size=batch, local_epochs=1, chunk_size=chunk,
                      compute_dtype="bfloat16",
                      generator_opt=opt, discriminator_opt=opt,
                      # cross-round XLA pipelining; numerics-invariant
                      # (tests/test_engine_coverage.py), +6% measured on the
                      # headline config (REPORT.md §4)
                      scan_unroll=2)
    spec = get_spec(dataset)  # falls back to synthetic pixels; compute identical
    data, _ = spec.load("data", max_examples=max_ex)
    shards_np, _ = shard_data(data, n_workers, iid=True, seed=0)
    eng = MDGANEngine(spec, cfg, num_workers=n_workers)
    st = eng.init_state(seed=1)
    shards = eng.shard_data(shards_np)
    sampler = ShardSampler(n_workers, shards_np.shape[1], batch, seed=0)
    return eng, st, shards, sampler


def kernel_cost_fields(name: str, steps_per_sec: float) -> dict:
    """Utilization fields for the named config's chunk program at a given
    achieved rate.  Used by the sustained bench: the trainer loop dispatches
    the SAME compiled chunk program as the kernel bench (identical config,
    chunk length, unroll), so its per-round flops/bytes are the program's —
    only host overheads differ, and those are wall time, not FLOPs.  Cheap
    when the kernel bench already compiled the program in this process (the
    persistent compilation cache serves the lowering)."""
    import jax.numpy as jnp

    eng, st, shards, sampler = _setup_mdgan(name)
    # length-1 chunk: the cost model bills a scan body once (see
    # _utilization_fields), so a 1-round body is the per-round cost exactly
    idx = jnp.asarray(sampler.next_chunk(1))
    compiled = eng.chunk_fn(1).lower(st, shards, idx).compile()
    return _utilization_fields(compiled, 1, steps_per_sec)


def bench_mdgan(name: str, moment_dtype: str = "float32") -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    dataset, n_workers, batch, chunk, n_chunks, max_ex = CONFIGS[name]
    eng, st, shards, sampler = _setup_mdgan(name, moment_dtype)
    # AOT path: one explicit lower+compile gives both the callable used for
    # timing AND the executable's cost model (flops / bytes accessed) for
    # the utilization fields — no second compilation of the same program.
    idxs = [jnp.asarray(sampler.next_chunk(chunk)) for _ in range(n_chunks + 1)]
    run = eng.chunk_fn(chunk).lower(st, shards, idxs[0]).compile()

    # warmup / compile.  NB: sync via device_get of an output, not
    # block_until_ready — the tunneled TPU platform here resolves
    # block_until_ready before the computation has actually finished.
    st, metrics = run(st, shards, idxs[0])
    np.asarray(metrics["mean_d_loss"])

    t0 = time.perf_counter()
    for i in range(1, n_chunks + 1):
        st, metrics = run(st, shards, idxs[i])
    np.asarray(metrics["mean_d_loss"])  # forces completion of the whole chain
    dt = time.perf_counter() - t0

    steps = n_chunks * chunk
    steps_per_sec = steps / dt
    assert np.isfinite(np.asarray(metrics["mean_d_loss"])).all()
    out = {
        "metric": f"mdgan_{dataset.lower()}_{n_workers}worker_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "rounds/s",
        "images_per_sec_per_chip": round(
            steps_per_sec * batch * n_workers / jax.device_count(), 1),
        "batch_size": batch,
        "num_workers": n_workers,
        "device": str(jax.devices()[0]),
        "steps_timed": steps,
        "wall_s": round(dt, 3),
    }
    if moment_dtype != "float32":
        out["moment_dtype"] = moment_dtype
    # cost fields from a LENGTH-1 chunk program (scan body == one round;
    # the cost model bills loop bodies once — see _utilization_fields)
    cost_prog = eng.chunk_fn(1).lower(st, shards, idxs[0][:1]).compile()
    out.update(_utilization_fields(cost_prog, 1, steps_per_sec))
    if name == "headline":
        out.update({
            "metric": "mdgan_cifar10_8worker_steps_per_sec",
            "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
            "baseline_steps_per_sec": REFERENCE_STEPS_PER_SEC,
            "baseline_source": "reference 2-worker local run, median 0.131 s/round (BASELINE.md)",
        })
    elif name == "bigbatch":
        # distinct metric name: the f-string above would collide with the
        # headline (same dataset / worker count, different batch)
        out["metric"] = (f"mdgan_{dataset.lower()}_{n_workers}worker"
                         f"_b{batch}_steps_per_sec")
    return out


def bench_standalone() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mdgan_tpu.core.config import TrainConfig
    from mdgan_tpu.core.registry import get as get_spec
    from mdgan_tpu.data.sampler import ShardSampler
    from mdgan_tpu.engine.standalone import StandaloneEngine

    chunk, n_chunks, batch = 500, 6, 128
    cfg = TrainConfig(batch_size=batch, local_epochs=1, chunk_size=chunk,
                      compute_dtype="bfloat16")
    spec = get_spec("MNIST")
    data, _ = spec.load("data", max_examples=60000)
    eng = StandaloneEngine(spec, cfg)
    st = eng.init_state(seed=1)
    arr = jnp.asarray(data)
    sampler = ShardSampler(1, len(data), batch, seed=0)
    idxs = [jnp.asarray(sampler.next_chunk(chunk)[:, 0, :]) for _ in range(n_chunks + 1)]
    run = eng.chunk_fn(chunk).lower(st, arr, idxs[0]).compile()
    st, metrics = run(st, arr, idxs[0])
    np.asarray(metrics["mean_d_loss"])
    t0 = time.perf_counter()
    for i in range(1, n_chunks + 1):
        st, metrics = run(st, arr, idxs[i])
    np.asarray(metrics["mean_d_loss"])
    dt = time.perf_counter() - t0
    out = {
        "metric": "standalone_mnist_steps_per_sec",
        "value": round(n_chunks * chunk / dt, 2),
        "unit": "rounds/s",
        "batch_size": batch,
        "device": str(jax.devices()[0]),
        "wall_s": round(dt, 3),
    }
    cost_prog = eng.chunk_fn(1).lower(st, arr, idxs[0][:1]).compile()
    out.update(_utilization_fields(cost_prog, 1, n_chunks * chunk / dt))
    return out


def bench_sustained(rounds: int = 30000) -> dict:
    """Time the REAL trainer inner loop, not just the jitted kernel.

    Drives ``MDGANTrainer.train()`` end-to-end at the headline config and
    SCALE (30,000 rounds — the reference's full experiment length) with
    periodic eval/checkpointing off: the timed region includes the host-side
    index sampler, chunk scheduling, the batched metrics ``device_get``
    pipeline, span/worker CSV writes, discriminator swaps, the run's
    always-on final FID/IS eval + full-state checkpoint (fetch + orbax
    finalize, ~2-4 s on the tunneled runtime), and the final weight
    exports — every overhead a production run pays.  The run length matters:
    the end-of-run costs are fixed, so quoting a short run would bill them
    against the steady-state rate (round-3 measured overhead split on the
    tunneled runtime: 30k rounds = 18.1 s compute + ~6 s fixed tail).
    A warm-up run with the SAME chunk-length schedule (a swap boundary
    splits one chunk into lengths 1 and 499, plus the steady 500s, plus the
    final eval) first populates the persistent compilation cache so compile
    time is not billed to the steady-state rate.
    """
    import tempfile

    from mdgan_tpu.cli.train import build_parser, config_from_args
    from mdgan_tpu.engine.train_loop import MDGANTrainer

    def argv_for(n_rounds: int, swap: int, tmp: str):
        return [
            "--mode", "mdgan", "--dataset", "CIFAR10", "--num_workers", "8",
            "--epochs", str(n_rounds), "--batch_size", "10",
            "--swap_interval", str(swap), "--log_interval", "0",
            "--checkpoint_interval", "0", "--chunk_size", "500",
            "--scan_unroll", "2",
            "--max_examples", "50000",
            "--log_dir", f"{tmp}/logs", "--image_dir", f"{tmp}/imgs",
            "--weights_dir", f"{tmp}/weights", "--checkpoint_dir", f"{tmp}/ckpt",
        ]

    # swap at 1000 inside 1500 rounds compiles chunk lengths {500, 1, 499}
    # and the final-round eval/ckpt path — the exact shapes the timed run
    # (swap at 5000 inside `rounds`) will execute
    warm_tmp = tempfile.mkdtemp(prefix="mdgan_bench_warm_")
    warm = MDGANTrainer(config_from_args(build_parser().parse_args(
        argv_for(1500, 1000, warm_tmp))))
    warm.train()
    warm.close()

    tmp = tempfile.mkdtemp(prefix="mdgan_bench_")
    trainer = MDGANTrainer(config_from_args(build_parser().parse_args(
        argv_for(rounds, 5000, tmp))))
    summary = trainer.train()
    trainer.close()

    import jax
    import numpy as np

    assert summary["rounds"] == rounds
    assert np.isfinite(summary["final_mean_d_loss"])
    sps = summary["steps_per_sec"]
    out = {
        "metric": "mdgan_cifar10_8worker_sustained_steps_per_sec",
        "value": round(sps, 2),
        "unit": "rounds/s",
        "images_per_sec_per_chip": round(sps * 10 * 8 / jax.device_count(), 1),
        "batch_size": 10,
        "num_workers": 8,
        "device": str(jax.devices()[0]),
        "steps_timed": rounds,
        "wall_s": round(summary["wall_time_s"], 3),
        "includes": "host sampler + chunk dispatch + metrics device_get + "
                    "CSV logging + swap + final eval/ckpt + weight export",
        "vs_baseline": round(sps / REFERENCE_STEPS_PER_SEC, 2),
        "baseline_steps_per_sec": REFERENCE_STEPS_PER_SEC,
        "baseline_source": "reference 2-worker local run, median 0.131 s/round (BASELINE.md)",
    }
    # utilization at the SUSTAINED rate: same chunk program as the kernel
    # bench, so mfu/hbm_util here quantify what the host loop leaves on the
    # table relative to the kernel row's numbers
    out.update(kernel_cost_fields("headline", sps))
    return out


def bench_scaling(moment_dtype: str = "float32") -> list:
    """Worker-count scaling sweep on the CIFAR-10 kernel config.

    The reference's round time grows ~linearly in N (network-bound: its
    20-worker GCE run is 2.1x slower than 2-worker local). Here N multiplies
    on-device batch work until the MXU/HBM saturates — this sweep measures
    that curve on one chip (REPORT.md §4 scaling shape).  ``moment_dtype``
    reruns the sweep with bfloat16 Adam moments (REPORT.md §2's claimed
    HBM-floor cut; rows then carry a ``moment_dtype`` field).
    """
    out = []
    try:
        for n_workers in (2, 4, 8, 16, 32):
            CONFIGS["_scaling"] = ("CIFAR10", n_workers, 10, 500, 6, 50000)
            r = bench_mdgan("_scaling", moment_dtype)
            r["metric"] = "mdgan_cifar10_scaling_steps_per_sec"
            out.append(r)
    finally:
        CONFIGS.pop("_scaling", None)
    return out


def main() -> None:
    from mdgan_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="headline",
                   choices=list(CONFIGS) + ["standalone", "sustained",
                                            "scaling", "all"])
    p.add_argument("--sustained", action="store_true",
                   help="alias for --config sustained (times the real "
                        "trainer loop incl. all host overheads)")
    p.add_argument("--moment_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="Adam moment storage dtype for the kernel configs "
                        "(bfloat16 cuts the Adam HBM-traffic floor by a "
                        "third; REPORT.md §2)")
    args = p.parse_args()
    if args.sustained:
        args.config = "sustained"
    if args.config == "all":
        for name in CONFIGS:
            print(json.dumps(bench_mdgan(name, args.moment_dtype)))
        print(json.dumps(bench_standalone()))
        print(json.dumps(bench_sustained()))
    elif args.config == "standalone":
        print(json.dumps(bench_standalone()))
    elif args.config == "sustained":
        print(json.dumps(bench_sustained()))
    elif args.config == "scaling":
        for row in bench_scaling(args.moment_dtype):
            print(json.dumps(row))
    else:
        print(json.dumps(bench_mdgan(args.config, args.moment_dtype)))


if __name__ == "__main__":
    main()
