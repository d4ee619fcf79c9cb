"""Round-5 one-process TPU recorder: verify drive + all r05 artifacts.

Single long-lived process (rapid client churn wedges the tunneled TPU
runtime — .claude/skills/verify/SKILL.md).  Order:

  1. verify: bench.py headline gate (one JSON line) + a short MDGANTrainer
     sanity run with the round-5 trainer changes (standard-protocol eval in
     the shared helper path) + a short StandaloneTrainer run exercising the
     NEW standalone standard-protocol eval on the real chip.
  2. bench_bf16: --moment_dtype float32-vs-bfloat16, same process/window.
  3. profile: scripts/profile_parts.py --json (committed breakdown).
  4. straggler2: second-seed (12) runs, rates 0 / 0.3.
  5. convergence: standalone + MD-GAN N=2, 30k rounds, standard protocol.

Usage:
  cd /root/repo && PYTHONPATH=/root/.axon_site:/root/repo \
      python scripts/record_r05.py [--steps verify,bench_bf16,profile,straggler2,convergence]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))  # for profile_parts import
import record_artifacts as ra  # noqa: E402


def verify_drive(root: Path) -> None:
    import io
    from contextlib import redirect_stdout

    sys.path.insert(0, str(root))
    import bench

    import jax
    import numpy as np

    print(f"== devices: {jax.devices()}", flush=True)

    # 1a. the driver's bench gate
    buf = io.StringIO()
    old = sys.argv
    sys.argv = ["bench.py"]
    try:
        with redirect_stdout(buf):
            bench.main()
    finally:
        sys.argv = old
    row = json.loads(buf.getvalue().strip().splitlines()[-1])
    print(f"== verify bench: {row['value']} rounds/s "
          f"(vs_baseline {row.get('vs_baseline')})", flush=True)
    assert row["value"] > 0 and np.isfinite(row["value"])

    # 1b. short MD-GAN trainer run with the r05 standard-eval helper path
    out = Path("/tmp/r05_verify_mdgan")
    logs, imgs, weights = (ra._fresh(out / "logs"), ra._fresh(out / "imgs"),
                           ra._fresh(out / "weights"))
    ra.run_train([
        "--mode", "mdgan", "--dataset", "CIFAR10", "--num_workers", "8",
        "--epochs", "600", "--batch_size", "10", "--swap_interval", "200",
        "--log_interval", "200", "--seed", "11", "--chunk_size", "100",
        "--checkpoint_interval", "300",
        "--eval_n_samples", "1000", "--eval_standard_interval", "2",
    ] + ["--log_dir", logs, "--image_dir", imgs, "--weights_dir", weights,
         "--checkpoint_dir", str(out / "ckpt")], out / "summary.json")
    s = json.loads((out / "summary.json").read_text())
    # SKILL.md bit-stability pin for this config (re-pins whenever the
    # compiled chunk program changes; the r05 diff is host-side only, so the
    # bf16 trajectory should be IDENTICAL to the round-3/4 build — a
    # mismatch means an unintended compute-path change; report, don't kill
    # the batch)
    pin = 0.7359923124313354
    tag = "MATCH" if s["final_mean_d_loss"] == pin else f"MISMATCH vs pin {pin}"
    print(f"== verify mdgan final_mean_d_loss={s['final_mean_d_loss']!r} "
          f"[{tag}]", flush=True)
    assert s["rounds"] == 600
    std = [e for e in s["evals"] if "fid_standard" in e]
    assert len(std) >= 2 and all(np.isfinite(e["fid_standard"]) for e in std)

    # 1c. short standalone run exercising the NEW standard-protocol eval
    out = Path("/tmp/r05_verify_standalone")
    logs, imgs, weights = (ra._fresh(out / "logs"), ra._fresh(out / "imgs"),
                           ra._fresh(out / "weights"))
    ra.run_train([
        "--mode", "standalone", "--dataset", "CIFAR10",
        "--epochs", "600", "--batch_size", "10",
        "--log_interval", "200", "--seed", "11", "--chunk_size", "100",
        "--checkpoint_interval", "0",
        "--eval_n_samples", "1000", "--eval_standard_interval", "2",
    ] + ["--log_dir", logs, "--image_dir", imgs, "--weights_dir", weights,
         "--checkpoint_dir", str(out / "ckpt")], out / "summary.json")
    s = json.loads((out / "summary.json").read_text())
    std = [e for e in s["evals"] if "fid_standard" in e]
    # eval events 0,200,400 -> standard at 0, 400 (K=2) + forced final 599
    assert [e["epoch"] for e in std] == [0, 400, 599], std
    assert all(np.isfinite(e["fid_standard"]) for e in std)
    print("== verify standalone standard-protocol eval: OK "
          f"(std rounds {[e['epoch'] for e in std]})", flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--repo", default="/root/repo")
    p.add_argument("--steps",
                   default="verify,bench_bf16,profile,straggler2,convergence")
    args = p.parse_args()
    root = Path(args.repo)
    steps = args.steps.split(",")

    from mdgan_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    t0 = time.time()
    if "verify" in steps:
        verify_drive(root)
        print(f"== VERIFY DONE at {time.time() - t0:.0f}s", flush=True)
    if "bench_bf16" in steps:
        ra.record_bench_bf16(root)
        print(f"== BENCH_BF16 DONE at {time.time() - t0:.0f}s", flush=True)
    if "profile" in steps:
        ra.record_profile(root)
        print(f"== PROFILE DONE at {time.time() - t0:.0f}s", flush=True)
    if "straggler2" in steps:
        ra.record_straggler_seed2(root)
        print(f"== STRAGGLER2 DONE at {time.time() - t0:.0f}s", flush=True)
    if "convergence" in steps:
        ra.record_convergence(root)
        print(f"== CONVERGENCE DONE at {time.time() - t0:.0f}s", flush=True)
    print(f"== ALL DONE in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
