"""Smoke tests for ``examples/`` (VERDICT r4 weak #6: user-facing first-contact
files must not rot silently).

Each example runs as a REAL subprocess with tiny overrides on the virtual
CPU mesh, exactly as a user would invoke it; asserts exit 0 and the outputs
the example promises.  PYTHONPATH is the repo ONLY so an inherited
TPU-plugin sitecustomize can't reroute device ops (round-3 gotcha,
.claude/skills/verify/SKILL.md).
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = REPO / "examples"


def _run(argv, cwd, n_devices=8, timeout=480):
    env = dict(
        os.environ,
        PYTHONPATH=str(REPO),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n_devices}",
    )
    proc = subprocess.run([sys.executable] + argv, env=env, cwd=str(cwd),
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"{argv} failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}")
    return proc.stdout


def test_train_mdgan_minimal_example(tmp_path):
    out = _run([str(EXAMPLES / "train_mdgan_minimal.py"),
                "--dataset", "SyntheticMNIST", "--rounds", "10",
                "--chunk_size", "5", "--num_workers", "2",
                "--batch_size", "2", "--swap_interval", "5",
                "--compute_dtype", "float32"], cwd=tmp_path, n_devices=1)
    assert "swapped discriminator pairs" in out
    png = tmp_path / "mdgan_samples.png"
    assert png.exists() and png.stat().st_size > 0


def test_multichip_mesh_example(tmp_path):
    out = _run([str(EXAMPLES / "multichip_mesh.py"), "--force_cpu"],
               cwd=tmp_path)
    assert "mesh:" in out and "workers: 8" in out


def test_multichip_mesh_example_three_axes(tmp_path):
    out = _run([str(EXAMPLES / "multichip_mesh.py"), "--force_cpu",
                "--num_replicas", "2", "--num_tensor", "2"], cwd=tmp_path)
    assert "'tensor': 2" in out


def test_multihost_trainer_example(tmp_path):
    """Single-process invocation of the every-host script (the two-real-
    process equivalence of the same trainer is proven in test_multihost.py);
    trailing flags override the example's headline defaults."""
    out = _run([str(EXAMPLES / "multihost_trainer.py"),
                "--dataset", "SyntheticMNIST", "--max_examples", "64",
                "--epochs", "8", "--batch_size", "2", "--chunk_size", "4",
                "--swap_interval", "4", "--log_interval", "0",
                "--checkpoint_interval", "0", "--compute_dtype", "float32",
                "--n_samples", "4"], cwd=tmp_path)
    assert "'rounds': 8" in out
    assert (tmp_path / "weights" / "generator_final.npz").exists()
    csvs = list((tmp_path / "logs").glob("mdgan.8.SyntheticMNIST.worker.*.csv"))
    assert len(csvs) == 8
