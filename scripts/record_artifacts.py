"""One-process recorder for every committed TPU artifact (round-4 set).

Runs ALL device work in a single long-lived process (rapid client churn
wedges the tunneled TPU runtime — see .claude/skills/verify/SKILL.md):

  1. golden MD-GAN re-record  (2000 rounds, 8 workers, seed 42) with
     reference-exact eval images, --host_metrics, and the 10k-sample
     standard-protocol FID/IS alongside the 5-sample logging
  2. golden standalone re-record (2000 rounds, seed 42)
  3. headline full-scale run (30000 rounds, 101 evals, 8 workers, seed 42)
  4. bench: kernel headline, sustained trainer rate, worker-count scaling
     (JSON lines -> artifacts/bench/)

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/record_artifacts.py \
      [--steps golden,standalone,headline,bench,families,straggler,scale] \
      [--repo /root/repo]

Weights pruning (per-eval generator exports) is done afterwards by
``--prune`` (kept separate so a crashed run leaves everything inspectable).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path


def _fresh(d: Path) -> str:
    if d.exists():
        shutil.rmtree(d)
    d.mkdir(parents=True)
    return str(d)


def run_train(argv, summary_path: Path):
    """Invoke the training CLI in-process, capture its summary JSON line."""
    import io
    from contextlib import redirect_stdout

    from mdgan_tpu.cli import train as train_cli

    print(f"== train {' '.join(argv)}", flush=True)
    t0 = time.time()
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = train_cli.main(argv)
    assert rc == 0
    summary = buf.getvalue().strip().splitlines()[-1]
    json.loads(summary)  # must be the summary JSON line
    summary_path.write_text(summary)
    print(f"== done in {time.time() - t0:.1f}s: {summary[:300]}", flush=True)


def record_golden_mdgan(root: Path) -> None:
    out = root / "artifacts" / "golden" / "cifar10_w8_r2000"
    logs, imgs, weights = _fresh(out / "logs"), _fresh(out / "images"), _fresh(out / "weights")
    run_train([
        "--mode", "mdgan", "--dataset", "CIFAR10", "--num_workers", "8",
        "--epochs", "2000", "--batch_size", "10", "--swap_interval", "500",
        "--log_interval", "300", "--seed", "42",
        "--eval_n_samples", "10000",
        "--host_metrics", str(out / "logs" / "host.csv"),
        "--log_dir", logs, "--image_dir", imgs, "--weights_dir", weights,
        "--checkpoint_dir", "/tmp/golden_ckpt_r4",
    ], out / "summary.json")


def record_golden_standalone(root: Path) -> None:
    out = root / "artifacts" / "golden" / "cifar10_standalone_r2000"
    logs, imgs, weights = _fresh(out / "logs"), _fresh(out / "images"), _fresh(out / "weights")
    run_train([
        "--mode", "standalone", "--dataset", "CIFAR10",
        "--epochs", "2000", "--batch_size", "10",
        "--log_interval", "300", "--seed", "42",
        "--log_dir", logs, "--image_dir", imgs, "--weights_dir", weights,
        "--checkpoint_dir", "/tmp/golden_sa_ckpt_r4",
    ], out / "summary.json")


def record_headline(root: Path) -> None:
    out = root / "artifacts" / "headline" / "cifar10_w8_r30000"
    logs, imgs, weights = _fresh(out / "logs"), _fresh(out / "images"), _fresh(out / "weights")
    run_train([
        "--mode", "mdgan", "--dataset", "CIFAR10", "--num_workers", "8",
        "--epochs", "30000", "--batch_size", "10", "--swap_interval", "5000",
        "--log_interval", "300", "--seed", "42",
        # standard-protocol FID/IS on the flagship artifact (VERDICT r3 #5):
        # fid_standard/is_standard alongside the reference 5-sample columns.
        # Cadence 10 = 11 standard evals across the run (rounds 0, 3000, ...,
        # 27000, plus the forced final 29999): each 10k-sample eval costs
        # ~10 s of eval-thread
        # linear algebra on this 1-vCPU host, so every-eval would make the
        # flagship recording eval-bound by ~25 min for no extra signal.
        "--eval_n_samples", "10000", "--eval_standard_interval", "10",
        "--log_dir", logs, "--image_dir", imgs, "--weights_dir", weights,
        "--checkpoint_dir", "/tmp/headline_ckpt_r4",
    ], out / "summary.json")


def record_bench(root: Path) -> None:
    import io
    from contextlib import redirect_stdout

    sys.path.insert(0, str(root))
    import bench

    out = root / "artifacts" / "bench"
    out.mkdir(parents=True, exist_ok=True)

    def capture(argv, dest):
        buf = io.StringIO()
        old = sys.argv
        sys.argv = ["bench.py"] + argv
        try:
            with redirect_stdout(buf):
                bench.main()
        finally:
            sys.argv = old
        (out / dest).write_text(buf.getvalue())
        print(f"== bench {argv} ->\n{buf.getvalue()}", flush=True)

    capture(["--config", "headline"], "BENCH_headline_r04.json")
    capture(["--config", "sustained"], "BENCH_sustained_r04.json")
    capture(["--config", "scaling"], "BENCH_scaling_r04.json")


def record_bench_families(root: Path) -> None:
    """The non-headline BASELINE.json configs (REPORT.md §4 family table),
    one JSON line each -> BENCH_families_r04.json."""
    import json as _json

    sys.path.insert(0, str(root))
    import bench

    out = root / "artifacts" / "bench"
    out.mkdir(parents=True, exist_ok=True)
    lines = []
    for name in ("mnist4", "celeba16", "ffhq128_stylegan"):
        r = bench.bench_mdgan(name)
        print(f"== bench family {name} -> {r}", flush=True)
        lines.append(_json.dumps(r))
    r = bench.bench_standalone()
    print(f"== bench standalone -> {r}", flush=True)
    lines.append(_json.dumps(r))
    (out / "BENCH_families_r04.json").write_text("\n".join(lines) + "\n")


def record_scale_runs(root: Path) -> None:
    """Reference-scale committed runs: the reference's ground truth includes
    FULL 20-worker (10k rounds) and 40-worker (5k rounds) CIFAR-10 logs
    (``src/results/logs/mdgan.{20,40}.CIFAR10.*``).  Record the analogous
    seeded real-TPU runs -> artifacts/scale/.  Committed inventory matches
    the reference's at these scales: server CSV + ALL N worker CSVs (workers
    2..N gzipped, ~10x — ``spans.read_spans`` opens .gz transparently;
    worker 1 stays plain for direct tooling) + summary + a few grids;
    weights dropped (the reference commits none at these scales)."""
    import gzip

    for n, epochs in ((20, 10000), (40, 5000)):
        out = root / "artifacts" / "scale" / f"cifar10_w{n}_r{epochs}"
        logs, imgs, weights = (_fresh(out / "logs"), _fresh(out / "images"),
                               _fresh(out / "weights"))
        run_train([
            "--mode", "mdgan", "--dataset", "CIFAR10",
            "--num_workers", str(n), "--epochs", str(epochs),
            "--batch_size", "10", "--swap_interval", "5000",
            "--log_interval", "300", "--seed", "42",
            "--log_dir", logs, "--image_dir", imgs, "--weights_dir", weights,
            "--checkpoint_dir", f"/tmp/scale_ckpt_w{n}_r4",
        ], out / "summary.json")
        for p in sorted(Path(logs).glob("mdgan.*.worker.*.logs.csv")):
            if not p.name.endswith(".worker.1.logs.csv"):
                with open(p, "rb") as src, gzip.open(
                        f"{p}.gz", "wb", compresslevel=9) as dst:
                    shutil.copyfileobj(src, dst)
                p.unlink()
        shutil.rmtree(weights)
        grids = sorted(Path(imgs).glob("generated_epoch_*.png"),
                       key=lambda p: int(p.stem.rsplit("_", 1)[1]))
        keep = {grids[0], grids[len(grids) // 2], grids[-1]} if grids else set()
        for p in grids:
            if p not in keep:
                p.unlink()
        print(f"== scale w{n} r{epochs} recorded (all worker logs)", flush=True)


def record_straggler_sweep(root: Path) -> None:
    """Straggler-policy convergence sweep (REPORT.md §5.1): seeded
    2000-round runs at drop rates 0 (control), 0.3, 0.6, 0.9 ->
    artifacts/bench/STRAGGLER_sweep_r04.json (pinned by
    tests/test_bench_artifacts.py).

    r04 makes the sweep answer its own question (VERDICT r3 #3): the quality
    signal is the STANDARD-protocol FID/IS (10k samples — r03 proved the
    5-sample columns are noise: best_fid was non-monotonic in the rate), the
    loss trend is summarized over the final 200 rounds across all workers,
    and each rate's server + worker-1 CSVs plus ``analyze --compare``
    overlay figures are committed under
    ``artifacts/bench/straggler_sweep_r04/`` so the conclusion is checkable.
    """
    import numpy as np

    from mdgan_tpu.cli.analyze import plot_compare
    from mdgan_tpu.obs import spans as spans_lib

    out = root / "artifacts" / "bench"
    keep = out / "straggler_sweep_r04"
    if keep.exists():
        shutil.rmtree(keep)
    sweep = {}
    n_workers = 8
    for rate in ("0", "0.3", "0.6", "0.9"):
        scratch = Path(f"/tmp/straggler_r04_{rate}")
        logs, imgs, weights = (_fresh(scratch / "logs"), _fresh(scratch / "imgs"),
                               _fresh(scratch / "weights"))
        t0 = time.time()
        run_train([
            "--mode", "mdgan", "--dataset", "CIFAR10",
            "--num_workers", str(n_workers),
            "--epochs", "2000", "--batch_size", "10", "--swap_interval", "500",
            "--log_interval", "500", "--seed", "11", "--checkpoint_interval", "0",
            "--straggler_rate", rate, "--eval_n_samples", "10000",
            "--log_dir", logs, "--image_dir", imgs, "--weights_dir", weights,
            "--checkpoint_dir", str(scratch / "ckpt"),
        ], scratch / "summary.json")
        wall = time.time() - t0
        summary = json.loads((scratch / "summary.json").read_text())
        rows = spans_lib.read_spans(
            Path(logs) / f"mdgan.{n_workers}.CIFAR10.server.logs.csv")
        nfb = [r["n_feedbacks"] for r in rows
               if isinstance(r.get("n_feedbacks"), float)]
        fids = [r["fid"] for r in rows if isinstance(r.get("fid"), float)]
        fstd = [(r["epoch"], r["fid_standard"]) for r in rows
                if isinstance(r.get("fid_standard"), float)]
        # loss trend across ALL workers over the final 200 rounds (the
        # worker CSVs carry the per-round per-worker series)
        tail = []
        for w in range(1, n_workers + 1):
            wrows = spans_lib.read_spans(
                Path(logs) / f"mdgan.{n_workers}.CIFAR10.worker.{w}.logs.csv")
            tail.append([r["mean_d_loss"] for r in wrows[-200:]])
        dest = keep / f"rate_{rate}"
        dest.mkdir(parents=True)
        shutil.copy(Path(logs) / f"mdgan.{n_workers}.CIFAR10.server.logs.csv",
                    dest)
        shutil.copy(Path(logs) / f"mdgan.{n_workers}.CIFAR10.worker.1.logs.csv",
                    dest)
        sweep[rate] = dict(
            final_mean_d_loss=summary["final_mean_d_loss"],
            d_loss_last200_mean=round(float(np.mean(tail)), 4),
            wall_s=round(wall, 2),
            rounds_per_sec=round(2000 / wall, 1),
            # the rate-0 control has no n_feedbacks column (opt-in schema):
            # every feedback is accepted, |S| == N by construction
            n_feedbacks_mean=(round(float(np.mean(nfb)), 2) if nfb
                              else float(n_workers)),
            best_fid_standard=round(min(v for _, v in fstd), 2) if fstd else None,
            final_fid_standard=round(fstd[-1][1], 2) if fstd else None,
            # 5-sample columns kept ONLY to document their noise (REPORT §5.1)
            best_fid_5sample=round(min(fids), 2) if fids else None,
            final_fid_5sample=round(fids[-1], 2) if fids else None,
            feature_source=summary.get("feature_source"),
        )
        print(f"== straggler rate={rate}: {sweep[rate]}", flush=True)
    (out / "STRAGGLER_sweep_r04.json").write_text(json.dumps(sweep, indent=1) + "\n")
    # cross-rate overlay figures: fid_standard / is_standard / 5-sample fid /
    # n_feedbacks from the server CSVs, mean_d_loss from the worker CSVs
    servers = sorted(keep.glob("rate_*/mdgan.*.server.logs.csv"))
    workers = sorted(keep.glob("rate_*/mdgan.*.worker.1.logs.csv"))
    plot_compare(servers, keep / "figures")
    plot_compare(workers, keep / "figures")
    print(f"== straggler sweep figures -> {keep / 'figures'}", flush=True)


def record_convergence(root: Path, only: str | None = None) -> None:
    """The reference's central convergence experiment, reproduced in-framework
    (VERDICT r4 #1): matched-seed standalone vs MD-GAN at N=2 and N=4 —
    30,000 rounds each, seed 42, the standard 10k-sample FID/IS protocol at
    the SAME cadence as the committed N=8 headline run (every 10th eval event
    + final round) — so all the runs' ``fid_standard`` series are directly
    comparable.  The reference ran exactly this comparison (standalone vs
    N∈{4,10,20,40}) and concluded distributed converges worse/slower per
    round (``/root/reference/report/sections/discussion.tex:36-43``;
    experiment inventory ``results.tex:4``).  Committed under
    ``artifacts/convergence/`` with ``analyze --compare`` overlay figures
    spanning every run.

    ``only`` re-records a single leg; the comparison summary and figures are
    always regenerated from every leg whose CSV exists on disk.
    """
    import gzip

    from mdgan_tpu.cli.analyze import plot_compare

    base = root / "artifacts" / "convergence"
    runs = {
        "cifar10_standalone_r30000": [
            "--mode", "standalone", "--dataset", "CIFAR10",
            "--epochs", "30000", "--batch_size", "10",
            "--log_interval", "300", "--seed", "42",
            "--checkpoint_interval", "0",
            "--eval_n_samples", "10000", "--eval_standard_interval", "10",
        ],
        "cifar10_w2_r30000": [
            "--mode", "mdgan", "--dataset", "CIFAR10", "--num_workers", "2",
            "--epochs", "30000", "--batch_size", "10",
            "--swap_interval", "5000", "--log_interval", "300",
            "--seed", "42", "--checkpoint_interval", "0",
            "--eval_n_samples", "10000", "--eval_standard_interval", "10",
        ],
        "cifar10_w4_r30000": [
            "--mode", "mdgan", "--dataset", "CIFAR10", "--num_workers", "4",
            "--epochs", "30000", "--batch_size", "10",
            "--swap_interval", "5000", "--log_interval", "300",
            "--seed", "42", "--checkpoint_interval", "0",
            "--eval_n_samples", "10000", "--eval_standard_interval", "10",
        ],
    }
    for name, argv in runs.items():
        if only is not None and name != only:
            continue
        out = base / name
        logs, imgs, weights = (_fresh(out / "logs"), _fresh(out / "images"),
                               _fresh(out / "weights"))
        run_train(argv + [
            "--log_dir", logs, "--image_dir", imgs, "--weights_dir", weights,
            "--checkpoint_dir", f"/tmp/conv_ckpt_{name}",
        ], out / "summary.json")
        # committed inventory: logs + summary + 3 grids; weights dropped
        # (the comparison is metric curves; the goldens carry weight ground
        # truth) and per-worker CSVs gzipped past worker 1 (scale convention)
        shutil.rmtree(weights)
        for p in sorted(Path(logs).glob("mdgan.*.worker.*.logs.csv")):
            if not p.name.endswith(".worker.1.logs.csv"):
                with open(p, "rb") as src, gzip.open(
                        f"{p}.gz", "wb", compresslevel=9) as dst:
                    shutil.copyfileobj(src, dst)
                p.unlink()
        grids = sorted(Path(imgs).glob("*_[0-9]*.png"),
                       key=lambda p: int(p.stem.rsplit("_", 1)[1]))
        keep = {grids[0], grids[len(grids) // 2], grids[-1]} if grids else set()
        for p in grids:
            if p not in keep:
                p.unlink()
        print(f"== convergence {name} recorded", flush=True)

    # cross-run overlays: standalone vs w2/w4 vs the committed w8 headline
    csvs = [
        base / "cifar10_standalone_r30000" / "logs" / "CIFAR10.standalone.logs.csv",
        base / "cifar10_w2_r30000" / "logs" / "mdgan.2.CIFAR10.server.logs.csv",
        base / "cifar10_w4_r30000" / "logs" / "mdgan.4.CIFAR10.server.logs.csv",
        root / "artifacts" / "headline" / "cifar10_w8_r30000" / "logs"
        / "mdgan.8.CIFAR10.server.logs.csv",
    ]
    plot_compare([p for p in csvs if p.exists()], base / "figures")

    # machine-readable comparison summary (pinned by tests): every leg's
    # fid_standard series side by side
    from mdgan_tpu.obs import spans as spans_lib

    comp = {}
    for label, p in zip(("standalone", "mdgan_w2", "mdgan_w4", "mdgan_w8"),
                        csvs):
        if not p.exists():
            continue
        rows = spans_lib.read_spans(p)
        series = [(int(r["epoch"]), round(r["fid_standard"], 2))
                  for r in rows if isinstance(r.get("fid_standard"), float)]
        iss = [(int(r["epoch"]), round(r["is_standard"], 4))
               for r in rows if isinstance(r.get("is_standard"), float)]
        comp[label] = {
            "fid_standard": series,
            "is_standard": iss,
            "best_fid_standard": min(v for _, v in series) if series else None,
            "final_fid_standard": series[-1][1] if series else None,
        }
    (base / "COMPARISON.json").write_text(json.dumps(comp, indent=1) + "\n")
    print(f"== convergence comparison -> {base / 'COMPARISON.json'}", flush=True)


def record_straggler_seed2(root: Path,
                           rates: tuple = ("0", "0.3")) -> None:
    """Second-seed control for the straggler sweep (VERDICT r4 #2): drop
    rates re-recorded with seed 12 (the r04 sweep used seed 11), identical
    protocol — the cross-seed best-FID spread is the run-to-run noise band
    REPORT §5.1's 'within run-to-run noise' claim must quote.  Merges into
    any existing artifact so rates can be recorded incrementally.
    -> artifacts/bench/STRAGGLER_sweep_seed2_r05.json
    """
    import numpy as np

    from mdgan_tpu.obs import spans as spans_lib

    out = root / "artifacts" / "bench"
    artifact = out / "STRAGGLER_sweep_seed2_r05.json"
    n_workers = 8
    sweep = json.loads(artifact.read_text()) if artifact.exists() else {}
    for rate in rates:
        scratch = Path(f"/tmp/straggler_r05_s12_{rate}")
        logs, imgs, weights = (_fresh(scratch / "logs"), _fresh(scratch / "imgs"),
                               _fresh(scratch / "weights"))
        t0 = time.time()
        run_train([
            "--mode", "mdgan", "--dataset", "CIFAR10",
            "--num_workers", str(n_workers),
            "--epochs", "2000", "--batch_size", "10", "--swap_interval", "500",
            "--log_interval", "500", "--seed", "12", "--checkpoint_interval", "0",
            "--straggler_rate", rate, "--eval_n_samples", "10000",
            "--log_dir", logs, "--image_dir", imgs, "--weights_dir", weights,
            "--checkpoint_dir", str(scratch / "ckpt"),
        ], scratch / "summary.json")
        wall = time.time() - t0
        summary = json.loads((scratch / "summary.json").read_text())
        rows = spans_lib.read_spans(
            Path(logs) / f"mdgan.{n_workers}.CIFAR10.server.logs.csv")
        fstd = [(r["epoch"], r["fid_standard"]) for r in rows
                if isinstance(r.get("fid_standard"), float)]
        nfb = [r["n_feedbacks"] for r in rows
               if isinstance(r.get("n_feedbacks"), float)]
        sweep[rate] = dict(
            seed=12,
            final_mean_d_loss=summary["final_mean_d_loss"],
            wall_s=round(wall, 2),
            n_feedbacks_mean=(round(float(np.mean(nfb)), 2) if nfb
                              else float(n_workers)),
            best_fid_standard=round(min(v for _, v in fstd), 2) if fstd else None,
            final_fid_standard=round(fstd[-1][1], 2) if fstd else None,
            feature_source=summary.get("feature_source"),
        )
        print(f"== straggler seed2 rate={rate}: {sweep[rate]}", flush=True)

    # cross-seed spread vs the committed seed-11 sweep, over every recorded
    # rate (incremental recordings extend it)
    r04 = json.loads((out / "STRAGGLER_sweep_r04.json").read_text())
    spread = sweep.get("cross_seed_best_fid_spread", {})
    for rate in sorted(k for k in sweep if k != "cross_seed_best_fid_spread"):
        a, b = r04[rate]["best_fid_standard"], sweep[rate]["best_fid_standard"]
        spread[rate] = dict(seed11=a, seed12=b, abs_spread=round(abs(a - b), 2),
                            rel_spread=round(abs(a - b) / min(a, b), 3))
    sweep["cross_seed_best_fid_spread"] = spread
    artifact.write_text(json.dumps(sweep, indent=1) + "\n")
    print(f"== straggler seed2 sweep -> spread {spread}", flush=True)


def record_bench_bf16(root: Path) -> None:
    """--moment_dtype bfloat16 measured against float32 back-to-back in the
    SAME process/tunnel window (VERDICT r4 #5): headline kernel row + the
    full worker-scaling sweep, both dtypes
    -> artifacts/bench/BENCH_moments_bf16_r05.json (one JSON line per row;
    bf16 rows carry ``moment_dtype``)."""
    import json as _json

    sys.path.insert(0, str(root))
    import bench

    out = root / "artifacts" / "bench"
    out.mkdir(parents=True, exist_ok=True)
    lines = []
    for dtype in ("float32", "bfloat16"):
        r = bench.bench_mdgan("headline", dtype)
        print(f"== bench headline moment_dtype={dtype} -> {r}", flush=True)
        lines.append(_json.dumps(r))
    for dtype in ("float32", "bfloat16"):
        for r in bench.bench_scaling(dtype):
            print(f"== bench scaling moment_dtype={dtype} N={r['num_workers']}"
                  f" -> {r['value']} rounds/s", flush=True)
            lines.append(_json.dumps(r))
    (out / "BENCH_moments_bf16_r05.json").write_text("\n".join(lines) + "\n")


def record_profile(root: Path) -> None:
    """Committed per-component round breakdown (VERDICT r4 #4): run
    scripts/profile_parts.py on the real device and commit its JSON
    -> artifacts/bench/PROFILE_parts_r05.json (cited from REPORT §2)."""
    import profile_parts  # scripts/ is on sys.path when run as a script

    out = root / "artifacts" / "bench" / "PROFILE_parts_r05.json"
    old = sys.argv
    sys.argv = ["profile_parts.py", "--json", str(out)]
    try:
        profile_parts.main()
    finally:
        sys.argv = old
    print(f"== profile parts -> {out}", flush=True)


def prune_weights(root: Path) -> None:
    """Make the committed inventory match each run's MANIFEST:

    * both runs: drop per-eval generator exports except the best-FID
      snapshot + final (the 2k-golden convention from round 2);
    * headline only (its MANIFEST's pruned-contents list): drop the 8 worker
      CSVs (reproducible from the seeded command; the 2k golden commits the
      worker-level ground truth) and keep only the 6 listed image grids —
      rounds 0, 300, the 1/3- and 2/3-spread evals, best-FID, and final."""
    import csv

    for run in ("golden/cifar10_w8_r2000", "headline/cifar10_w8_r30000"):
        out = root / "artifacts" / run
        csvs = list((out / "logs").glob("mdgan.*.server.logs.csv"))
        if not csvs:
            continue
        rows = list(csv.DictReader(open(csvs[0])))
        fids = [(float(r["fid"]), int(float(r["epoch"])))
                for r in rows if r.get("fid")]
        keep = {min(fids)[1]} if fids else set()
        for p in sorted((out / "weights").glob("generator_*.npz")):
            stem = p.stem.replace("generator_", "")
            if stem != "final" and (not stem.isdigit() or int(stem) not in keep):
                p.unlink()
        print(f"pruned {run}: kept best-FID {sorted(keep)} + final", flush=True)

        if run.startswith("headline/"):
            for p in sorted((out / "logs").glob("mdgan.*.worker.*.logs.csv")):
                p.unlink()
            epochs = sorted(int(float(r["epoch"])) for r in rows if r.get("fid"))
            final, cadence = epochs[-1], epochs[2] - epochs[1]
            spread = {round(final / 3 / cadence) * cadence,
                      round(2 * final / 3 / cadence) * cadence}
            keep_imgs = {0, epochs[1], final} | keep | spread
            for p in sorted((out / "images").glob("generated_epoch_*.png")):
                e = p.stem.replace("generated_epoch_", "")
                if not e.isdigit() or int(e) not in keep_imgs:
                    p.unlink()
            print(f"pruned {run}: worker CSVs dropped, images kept "
                  f"{sorted(keep_imgs)}", flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--repo", default="/root/repo")
    p.add_argument("--steps", default="golden,standalone,headline,bench")
    p.add_argument("--prune", action="store_true",
                   help="only prune per-eval weight exports, no training")
    args = p.parse_args()
    root = Path(args.repo)
    if args.prune:
        prune_weights(root)
        return
    steps = args.steps.split(",")
    from mdgan_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    if "golden" in steps:
        record_golden_mdgan(root)
    if "standalone" in steps:
        record_golden_standalone(root)
    if "headline" in steps:
        record_headline(root)
    if "bench" in steps:
        record_bench(root)
    if "families" in steps:
        record_bench_families(root)
    if "straggler" in steps:
        record_straggler_sweep(root)
    if "scale" in steps:
        record_scale_runs(root)
    if "convergence" in steps:
        record_convergence(root)
    if "straggler2" in steps:
        record_straggler_seed2(root)
    if "bench_bf16" in steps:
        record_bench_bf16(root)
    if "profile" in steps:
        record_profile(root)


if __name__ == "__main__":
    main()
