"""Host train-loop integration tests (CPU, tiny configs).

Inception-based metrics are stubbed here (their math is covered in
test_metrics.py) so these tests exercise scheduling, logging, checkpointing,
swap cadence, and artifact layout quickly.
"""

import json

import numpy as np
import pytest

import mdgan_tpu.metrics.fid as fid_mod
from mdgan_tpu.cli.train import build_parser, config_from_args
from mdgan_tpu.engine.train_loop import MDGANTrainer, StandaloneTrainer, _next_event
from mdgan_tpu.obs import spans as spans_lib


@pytest.fixture()
def stub_inception(monkeypatch):
    class FakeTracker:
        def __init__(self, real):
            self.n = len(real)

        def score(self, fakes):
            return 123.0

        def inception_score(self, fakes, splits=1):
            return (2.0, 0.0)

    monkeypatch.setattr(fid_mod, "FIDTracker", FakeTracker)
    monkeypatch.setattr(fid_mod, "inception_score", lambda imgs, splits=1: (2.0, 0.0))
    # with the FID stack stubbed, inception never runs in these tests — but
    # a REAL inception test earlier in the same pytest process leaves the
    # module cache populated, which would leak into summary.json's
    # feature_source stamp; reset it for the test (monkeypatch restores the
    # warm cache afterwards)
    from mdgan_tpu.metrics import inception as inception_mod

    monkeypatch.setattr(inception_mod, "_CACHED", None)


def _cfg(tmp_path, argv):
    base = [
        "--dataset", "SyntheticMNIST", "--max_examples", "256",
        "--compute_dtype", "float32",
        "--log_dir", str(tmp_path / "logs"),
        "--image_dir", str(tmp_path / "imgs"),
        "--weights_dir", str(tmp_path / "weights"),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ]
    return config_from_args(build_parser().parse_args(base + argv))


def test_next_event_schedule():
    # swap at 40/80, log at 60, end at 119
    assert _next_event(0, 120, 40, 60, 4) == 0      # eval at round 0
    assert _next_event(1, 120, 40, 60, 4) == 40
    assert _next_event(41, 120, 40, 60, 4) == 60
    assert _next_event(61, 120, 40, 60, 4) == 80
    assert _next_event(81, 120, 40, 60, 4) == 119
    # single worker: no swaps
    assert _next_event(1, 120, 40, 60, 1) == 60


@pytest.mark.slow
def test_mdgan_trainer_end_to_end(tmp_path, stub_inception):
    cfg = _cfg(tmp_path, [
        "--mode", "mdgan", "--num_workers", "4", "--epochs", "50",
        "--batch_size", "4", "--swap_interval", "20", "--log_interval", "25",
        "--chunk_size", "10",
    ])
    trainer = MDGANTrainer(cfg)
    summary = trainer.train()
    trainer.close()

    assert summary["rounds"] == 50
    assert np.isfinite(summary["final_mean_d_loss"])
    # evals at 0, 25, 49 (end)
    assert [e["epoch"] for e in summary["evals"]] == [0, 25, 49]
    assert all(e["fid"] == 123.0 for e in summary["evals"])

    # artifact layout (reference parity)
    assert (tmp_path / "imgs" / "real_images.png").exists()
    assert (tmp_path / "imgs" / "generated_epoch_0.png").exists()
    assert (tmp_path / "weights" / "generator_final.npz").exists()
    for r in range(1, 5):
        assert (tmp_path / "weights" / f"worker_{r}" / "discriminator.npz").exists()

    server_rows = spans_lib.read_spans(
        tmp_path / "logs" / "mdgan.4.SyntheticMNIST.server.logs.csv")
    assert len(server_rows) >= 4
    swaps = [r for r in server_rows if r.get("swap") in (True, "True")]
    assert len(swaps) == 2  # rounds 20 and 40
    worker_rows = spans_lib.read_spans(
        tmp_path / "logs" / "mdgan.4.SyntheticMNIST.worker.1.logs.csv")
    assert all(isinstance(r["mean_d_loss"], float) for r in worker_rows)


@pytest.mark.slow
def test_mdgan_trainer_resume(tmp_path, stub_inception):
    argv = [
        "--mode", "mdgan", "--num_workers", "2", "--epochs", "30",
        "--batch_size", "4", "--swap_interval", "10", "--log_interval", "15",
        "--chunk_size", "5",
    ]
    t1 = MDGANTrainer(_cfg(tmp_path, argv))
    t1.train()
    t1.close()

    # full run in one go for comparison
    t_full = MDGANTrainer(_cfg(tmp_path / "full", argv))
    t_full.train()
    import jax

    full_params = jax.device_get(t_full.state.g.params)
    t_full.close()

    # interrupted run: train to 15 (ckpt), then resume to 30
    t2 = MDGANTrainer(_cfg(tmp_path / "half", [
        "--mode", "mdgan", "--num_workers", "2", "--epochs", "16",
        "--batch_size", "4", "--swap_interval", "10", "--log_interval", "15",
        "--chunk_size", "5",
    ]))
    t2.train()
    t2.close()
    t3 = MDGANTrainer(_cfg(tmp_path / "half", argv + ["--resume"]))
    assert int(t3.state.step) == 16  # resumed at checkpoint of round 15
    t3.train()
    resumed_params = jax.device_get(t3.state.g.params)
    t3.close()

    for la, lb in zip(jax.tree.leaves(full_params), jax.tree.leaves(resumed_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=0, rtol=0)


@pytest.mark.slow
def test_mdgan_trainer_tensor_axis_resume(tmp_path, stub_inception):
    """The FULL trainer under --num_tensor 2 (generator tensor parallelism):
    the CLI flag flows into the mesh, live generator params land
    tensor-sharded, and an interrupted+resumed run is bit-identical to an
    uninterrupted one — the resume path re-places restored host arrays
    under the tensor sharding (engine.shard_state)."""
    import jax

    argv = [
        "--mode", "mdgan", "--num_workers", "2", "--num_tensor", "2",
        "--epochs", "12", "--batch_size", "4", "--swap_interval", "0",
        "--log_interval", "6", "--chunk_size", "6",
    ]
    t_full = MDGANTrainer(_cfg(tmp_path / "full", argv))
    assert dict(t_full.engine.mesh.shape) == {
        "replica": 1, "workers": 2, "tensor": 2}
    sharded = [a.sharding.spec for a in jax.tree.leaves(t_full.state.g.params)
               if a.ndim >= 1 and a.shape[-1] % 2 == 0]
    assert sharded and all(sp[-1] == "tensor" for sp in sharded)
    t_full.train()
    full_params = jax.device_get(t_full.state.g.params)
    t_full.close()

    half_argv = list(argv)
    half_argv[half_argv.index("--epochs") + 1] = "7"
    t_half = MDGANTrainer(_cfg(tmp_path / "half", half_argv))
    assert t_half.cfg.train.epochs == 7
    t_half.train()
    t_half.close()
    t_res = MDGANTrainer(_cfg(tmp_path / "half", argv + ["--resume"]))
    assert int(t_res.state.step) == 7  # the interrupted run's final ckpt
    res_sharded = [a.sharding.spec
                   for a in jax.tree.leaves(t_res.state.g.params)
                   if a.ndim >= 1 and a.shape[-1] % 2 == 0]
    assert res_sharded and all(sp[-1] == "tensor" for sp in res_sharded)
    t_res.train()
    resumed_params = jax.device_get(t_res.state.g.params)
    t_res.close()

    for la, lb in zip(jax.tree.leaves(full_params),
                      jax.tree.leaves(resumed_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=0, rtol=0)


@pytest.mark.slow
def test_standalone_resume_bit_identical(tmp_path, stub_inception):
    """StandaloneTrainer checkpoint/resume (the §5.3/5.4 superset, now on the
    standalone path too): a run killed at its round-19 checkpoint and resumed
    to 30 rounds must reproduce the uninterrupted 30-round run bit-for-bit."""
    import jax

    def argv(n_epochs):
        return ["--mode", "standalone", "--epochs", str(n_epochs),
                "--batch_size", "4", "--log_interval", "0",
                "--chunk_size", "5", "--checkpoint_interval", "10"]

    full = StandaloneTrainer(_cfg(tmp_path / "full", argv(30)))
    full.train()
    full_params = jax.device_get(full.state.g.params)
    full.close()

    part = StandaloneTrainer(_cfg(tmp_path / "part", argv(20)))
    part.train()
    part.close()
    resumed = StandaloneTrainer(_cfg(tmp_path / "part", argv(30) + ["--resume"]))
    # final ckpt of the 20-round run holds the post-round-19 state (step 20)
    assert int(resumed.state.step) == 20
    resumed.train()
    resumed_params = jax.device_get(resumed.state.g.params)
    resumed.close()

    for la, lb in zip(jax.tree.leaves(full_params), jax.tree.leaves(resumed_params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_standalone_trainer(tmp_path, stub_inception):
    cfg = _cfg(tmp_path, [
        "--mode", "standalone", "--epochs", "20", "--batch_size", "8",
        "--log_interval", "10", "--chunk_size", "5",
    ])
    trainer = StandaloneTrainer(cfg)
    summary = trainer.train()
    trainer.close()
    assert summary["rounds"] == 20
    assert np.isfinite(summary["final_mean_g_loss"])
    assert (tmp_path / "weights" / "netG_epoch_19.npz").exists()
    assert (tmp_path / "imgs" / "fake_samples_0.png").exists()


def test_trainer_consumes_real_format_data_dir(tmp_path, stub_inception):
    """End-to-end: the full MD-GAN trainer reads REAL-format dataset files
    from ``--data_dir`` (reference ``CIFAR10.py:16-73`` pickle batches) —
    not the synthetic fallback — without any code changes.  Hardens the
    claim REPORT §6 makes about the committed synthetic-pixel runs: a user
    with the real files gets them end-to-end through the same CLI path."""
    import pickle

    d = tmp_path / "data" / "cifar-10-batches-py"
    d.mkdir(parents=True)
    rng = np.random.default_rng(7)
    raws = []
    for i in range(1, 6):
        raw = rng.integers(0, 256, (10, 3072), dtype=np.uint8)
        raws.append(raw)
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": raw, b"labels": list(range(10))}, f)
    expected = (np.concatenate(raws).reshape(-1, 3, 32, 32)
                .transpose(0, 2, 3, 1))

    cfg = _cfg(tmp_path, [
        "--mode", "mdgan", "--dataset", "CIFAR10",
        "--data_dir", str(tmp_path / "data"),
        "--num_workers", "2", "--epochs", "6", "--batch_size", "4",
        "--swap_interval", "0", "--log_interval", "3", "--chunk_size", "3",
    ])
    trainer = MDGANTrainer(cfg)
    try:
        # the trainer's dataset IS the fixture's pixels (50 rows), proving
        # the real-file branch was taken over the synthetic fallback
        np.testing.assert_array_equal(trainer.full_data, expected)
        summary = trainer.train()
        assert summary["rounds"] == 6
        assert np.isfinite(summary["final_mean_d_loss"])
    finally:
        trainer.close()


def test_cli_flag_surface():
    """Reference CLI flags must exist (``bootstrap.py:30-51``)."""
    p = build_parser()
    args = p.parse_args([
        "--dataset", "CIFAR10", "--epochs", "5", "--swap_interval", "2",
        "--local_epochs", "3", "--batch_size", "7", "--log_interval", "9",
        "--generator_lr", "1e-3", "--discriminator_lr", "2e-3",
        "--iid", "0", "--seed", "42", "--beta_1", "0.5", "--beta_2", "0.9",
        "--moment_dtype", "bfloat16",
    ])
    cfg = config_from_args(args)
    assert cfg.train.epochs == 5
    assert cfg.train.local_epochs == 3
    assert not cfg.data.iid
    assert cfg.train.generator_opt.beta_1 == 0.5
    assert cfg.train.discriminator_opt.lr == 2e-3
    assert cfg.train.generator_opt.mu_dtype == "bfloat16"
    assert cfg.train.generator_opt.nu_dtype == "bfloat16"
    assert cfg.train.discriminator_opt.nu_dtype == "bfloat16"
    # default is the float32 parity setting
    assert config_from_args(p.parse_args([])).train.generator_opt.nu_dtype == "float32"


@pytest.mark.slow
def test_standard_protocol_in_trainer(tmp_path, stub_inception):
    """--eval_n_samples > 0 must add fid_standard/is_standard to every eval
    record and to the server CSV columns (the rebuild's superset protocol,
    BASELINE.md), alongside the reference 5-sample numbers."""
    import csv

    argv = ["--mode", "mdgan", "--num_workers", "2", "--epochs", "4",
            "--batch_size", "2", "--chunk_size", "2", "--swap_interval", "0",
            "--log_interval", "2", "--checkpoint_interval", "0",
            "--eval_n_samples", "16"]
    tr = MDGANTrainer(_cfg(tmp_path, argv))
    summary = tr.train()
    tr.close()
    assert len(summary["evals"]) == 3  # rounds 0, 2, 3
    for rec in summary["evals"]:
        assert rec["fid"] == 123.0
        assert "fid_standard" in rec and "is_standard" in rec
        assert np.isfinite(rec["fid_standard"])
    rows = list(csv.DictReader(
        open(tmp_path / "logs" / "mdgan.2.SyntheticMNIST.server.logs.csv")))
    vals = [r["fid_standard"] for r in rows if r["fid_standard"]]
    assert len(vals) == 3

    # --eval_standard_interval K: standard eval on every K-th eval event
    # plus the final round; 5-sample logging stays on every eval round.
    # epochs=7, log_interval=2 -> evals at 0,2,4,6; K=2 -> standard at
    # events 0,2 (rounds 0,4) + forced final (round 6)
    argv2 = ["--mode", "mdgan", "--num_workers", "2", "--epochs", "7",
             "--batch_size", "2", "--chunk_size", "2", "--swap_interval", "0",
             "--log_interval", "2", "--checkpoint_interval", "0",
             "--eval_n_samples", "16", "--eval_standard_interval", "2"]
    tr2 = MDGANTrainer(_cfg(tmp_path / "k2", argv2))
    summary2 = tr2.train()
    tr2.close()
    assert [e["epoch"] for e in summary2["evals"]] == [0, 2, 4, 6]
    std_epochs = [e["epoch"] for e in summary2["evals"] if "fid_standard" in e]
    assert std_epochs == [0, 4, 6]

    # resume stability (r4 review): the cadence index is DERIVED from the
    # epoch, so a --resume'd run standard-evals the same rounds as an
    # uninterrupted one.  epochs=13, log=2, K=3 -> evals 0,2,..,12, standard
    # at eval indices 0,3,6 = rounds 0,6,12.  Interrupt after round 7 and
    # resume: post-resume evals 8,10,12 must standard-eval ONLY 12 (a
    # restarted counter would wrongly standard-eval round 8).
    base3 = ["--mode", "mdgan", "--num_workers", "2",
             "--batch_size", "2", "--chunk_size", "2", "--swap_interval", "0",
             "--log_interval", "2", "--checkpoint_interval", "4",
             "--eval_n_samples", "16", "--eval_standard_interval", "3"]
    th = MDGANTrainer(_cfg(tmp_path / "res", base3 + ["--epochs", "8"]))
    th.train()
    th.close()
    tr3 = MDGANTrainer(_cfg(tmp_path / "res",
                            base3 + ["--epochs", "13", "--resume"]))
    assert int(tr3.state.step) == 8
    summary3 = tr3.train()
    tr3.close()
    assert [e["epoch"] for e in summary3["evals"]] == [8, 10, 12]
    assert [e["epoch"] for e in summary3["evals"]
            if "fid_standard" in e] == [12]


@pytest.mark.slow
def test_standard_protocol_in_standalone_trainer(tmp_path, stub_inception):
    """The standalone baseline honors the same standard-protocol cadence as
    the MD-GAN trainer (shared ``_standard_protocol_eval`` helper): every
    K-th eval event by derived index, plus a forced final-round standard-only
    point.  This symmetry is what makes the distributed-vs-standalone
    convergence comparison (REPORT.md §5.2) apples-to-apples."""
    import csv

    # epochs=7, log_interval=2 -> 5-sample evals at rounds 0,2,4,6 (the
    # reference standalone has no forced final eval; 6 is a cadence hit);
    # K=2 -> standard at eval events 0,2 (rounds 0,4) + forced final (6)
    argv = ["--mode", "standalone", "--epochs", "7", "--batch_size", "2",
            "--chunk_size", "2", "--log_interval", "2",
            "--checkpoint_interval", "0",
            "--eval_n_samples", "16", "--eval_standard_interval", "2"]
    tr = StandaloneTrainer(_cfg(tmp_path, argv))
    summary = tr.train()
    tr.close()
    std = [e for e in summary["evals"] if "fid_standard" in e]
    assert [e["epoch"] for e in std] == [0, 4, 6]
    for rec in std:
        assert np.isfinite(rec["fid_standard"])
        assert "is_standard" in rec and "is_standard_std" in rec
    # merged history: one record per round even when both protocols ran
    assert [e["epoch"] for e in summary["evals"]] == [0, 2, 4, 6]
    assert summary["evals"][0]["fid"] == 123.0  # 5-sample eval still present
    rows = list(csv.DictReader(
        open(tmp_path / "logs" / "SyntheticMNIST.standalone.logs.csv")))
    by_epoch = {r["epoch"]: r for r in rows if r["fid_standard"]}
    assert sorted(by_epoch) == ["0", "4", "6"]


def test_batched_metrics_spans_non_overlapping(tmp_path, stub_inception):
    """Under the batched metrics fetch (metrics_flush > 1) the synthesized
    per-chunk windows must stay strictly ordered: consecutive server rows'
    epoch spans non-overlapping, every swap/checkpoint child span inside its
    parent window (the invariant the golden recordings pin)."""
    import csv

    argv = ["--mode", "mdgan", "--num_workers", "2", "--epochs", "40",
            "--batch_size", "2", "--chunk_size", "3", "--swap_interval", "10",
            "--log_interval", "0", "--checkpoint_interval", "15",
            "--metrics_flush", "4"]
    tr = MDGANTrainer(_cfg(tmp_path, argv))
    summary = tr.train()
    tr.close()
    assert summary["rounds"] == 40
    rows = list(csv.DictReader(
        open(tmp_path / "logs" / "mdgan.2.SyntheticMNIST.server.logs.csv")))
    prev_end = None
    for r in rows:
        a, b = float(r["start.epoch"]), float(r["end.epoch"])
        assert b >= a
        if prev_end is not None:
            assert a >= prev_end - 1e-9, (r["epoch"], a, prev_end)
        prev_end = b
        for child in ("swap", "checkpoint"):
            s, e = r.get(f"start.{child}"), r.get(f"end.{child}")
            if s and e:
                assert a - 1e-9 <= float(s) <= float(e) <= b + 1e-9, (
                    child, r["epoch"], a, s, e, b)
    # losses identical to an unbatched (per-chunk fetch) run
    argv1 = [x if x != "4" else "1" for x in argv]
    tr1 = MDGANTrainer(_cfg(tmp_path / "m1", argv1))
    summary1 = tr1.train()
    tr1.close()
    assert summary1["final_mean_d_loss"] == summary["final_mean_d_loss"]
    for w in (1, 2):
        a = [r["mean_d_loss"] for r in csv.DictReader(open(
            tmp_path / "logs" / f"mdgan.2.SyntheticMNIST.worker.{w}.logs.csv"))]
        b = [r["mean_d_loss"] for r in csv.DictReader(open(
            tmp_path / "m1" / "logs" / f"mdgan.2.SyntheticMNIST.worker.{w}.logs.csv"))]
        assert a == b  # bit-identical CSV loss columns for any metrics_flush


def test_worker_swap_spans_and_feature_source(tmp_path, stub_inception):
    """Swap rounds must carry the measured swap span on the swapping
    workers' rows (the spans.py attribution contract: swap_send == swap_recv
    == the fused program window, instruction/load zero-width at the edges —
    VERDICT r3 weak #5), and summary must record the inception feature mode
    (weak #6; None here because the FID stack is stubbed, so inception never
    ran)."""
    argv = ["--mode", "mdgan", "--num_workers", "2", "--epochs", "12",
            "--batch_size", "2", "--chunk_size", "4", "--swap_interval", "5",
            "--log_interval", "0", "--checkpoint_interval", "0"]
    tr = MDGANTrainer(_cfg(tmp_path, argv))
    summary = tr.train()
    tr.close()
    assert summary["feature_source"] is None
    for w in (1, 2):
        rows = spans_lib.read_spans(
            tmp_path / "logs" / f"mdgan.2.SyntheticMNIST.worker.{w}.logs.csv")
        assert len(rows) == 12
        swap_rows = [r for r in rows if isinstance(r.get("swap_with"), float)]
        assert [r["epoch"] for r in swap_rows] == [5.0, 10.0]
        for r in swap_rows:
            s, e = r["start.swap_send"], r["end.swap_send"]
            assert isinstance(s, float) and isinstance(e, float) and e >= s
            # child-within-parent: the copied swap window is clamped to the
            # swap row's own synthesized epoch span (a measured swap longer
            # than one round must not bleed into preceding rows' Gantt lanes)
            assert s >= r["start.epoch"] and e <= r["end.epoch"]
            assert r["start.swap_recv"] == s and r["end.swap_recv"] == e
            assert (r["start.swap_recv_instruction"]
                    == r["end.swap_recv_instruction"] == s)
            assert r["start.load_state_dict"] == r["end.load_state_dict"] == e
        for r in rows:
            if r not in swap_rows:
                assert r["start.swap_send"] is None
                assert r["start.swap_recv"] is None


def test_metrics_flush_above_chunk_count_still_flushes(tmp_path, stub_inception):
    """A --metrics_flush far larger than the run's chunk count must not
    starve the batched fetch: the clamp (train_loop submits at <=64 held
    chunks) keeps backpressure engaged and the end-of-run force submit
    drains the remainder — every worker row still lands, losses identical
    to a per-chunk-fetch run."""
    import csv

    argv = ["--mode", "mdgan", "--num_workers", "2", "--epochs", "30",
            "--batch_size", "2", "--chunk_size", "3", "--swap_interval", "0",
            "--log_interval", "0", "--metrics_flush", "100000"]
    tr = MDGANTrainer(_cfg(tmp_path, argv))
    summary = tr.train()
    tr.close()
    assert summary["rounds"] == 30
    argv1 = [x if x != "100000" else "1" for x in argv]
    tr1 = MDGANTrainer(_cfg(tmp_path / "m1", argv1))
    summary1 = tr1.train()
    tr1.close()
    assert summary1["final_mean_d_loss"] == summary["final_mean_d_loss"]
    for w in (1, 2):
        a = [r["mean_d_loss"] for r in csv.DictReader(open(
            tmp_path / "logs" / f"mdgan.2.SyntheticMNIST.worker.{w}.logs.csv"))]
        b = [r["mean_d_loss"] for r in csv.DictReader(open(
            tmp_path / "m1" / "logs" / f"mdgan.2.SyntheticMNIST.worker.{w}.logs.csv"))]
        assert len(a) == 30 and a == b


def test_chunk_schedule_randomized_invariants():
    """Property test over the host chunk scheduler: replaying _next_event's
    clipping must cover every round exactly once and place every swap, eval,
    and checkpoint boundary at a chunk END (the invariant the fused scan
    relies on: host events only fire between chunks)."""
    rng = np.random.default_rng(0)
    for _ in range(200):
        epochs = int(rng.integers(1, 400))
        chunk = int(rng.integers(1, 64))
        swap = int(rng.choice([0, rng.integers(1, 100)]))
        log_i = int(rng.choice([0, rng.integers(1, 100)]))
        ck = int(rng.choice([0, rng.integers(1, 150)]))
        n_workers = int(rng.choice([1, 2, 8]))

        cur, ends = 0, []
        while cur < epochs:
            event_end = _next_event(cur, epochs, swap, log_i, n_workers, ck)
            clen = min(chunk, event_end - cur + 1, epochs - cur)
            assert clen >= 1, (epochs, chunk, swap, log_i, ck, cur)
            cur += clen
            ends.append(cur - 1)
        assert cur == epochs  # every round covered exactly once
        boundary = set(ends)
        for e in range(epochs):
            is_swap = n_workers > 1 and swap > 0 and e > 0 and e % swap == 0
            is_log = (log_i > 0 and e % log_i == 0) or e == epochs - 1
            is_ck = (ck > 0 and e > 0 and e % ck == 0) or e == epochs - 1
            if is_swap or is_log or is_ck:
                assert e in boundary, (
                    f"event round {e} not a chunk end "
                    f"(epochs={epochs} chunk={chunk} swap={swap} "
                    f"log={log_i} ck={ck} N={n_workers} ends={ends[:20]})")


def test_eval_backpressure_bounds_queue(tmp_path, monkeypatch):
    """A slow eval must not accumulate unbounded snapshots: the trainer blocks
    once 4 evals are outstanding (each queued eval pins a device-side
    generator copy in HBM)."""
    import time as time_mod

    import mdgan_tpu.metrics.fid as fid_mod

    class SlowTracker:
        def __init__(self, real):
            pass

        def score(self, fakes):
            time_mod.sleep(0.3)
            return 1.0

        def inception_score(self, fakes, splits=1):
            return (1.0, 0.0)

    monkeypatch.setattr(fid_mod, "FIDTracker", SlowTracker)
    monkeypatch.setattr(fid_mod, "inception_score", lambda imgs, splits=1: (1.0, 0.0))

    argv = ["--mode", "mdgan", "--num_workers", "2", "--epochs", "20",
            "--batch_size", "2", "--chunk_size", "1", "--swap_interval", "0",
            "--log_interval", "1", "--checkpoint_interval", "0"]
    tr = MDGANTrainer(_cfg(tmp_path, argv))
    max_seen = 0
    orig_submit = tr._eval_pool.submit

    def watching_submit(*a, **kw):
        nonlocal max_seen
        max_seen = max(max_seen, len(tr._eval_backlog))
        return orig_submit(*a, **kw)

    tr._eval_pool.submit = watching_submit
    summary = tr.train()
    tr.close()
    assert len(summary["evals"]) == 20
    assert max_seen <= 4, max_seen


@pytest.mark.slow
def test_generate_from_full_checkpoint(tmp_path, stub_inception):
    """cli/generate --checkpoint must sample from the generator inside a
    full orbax training checkpoint (no weights-only npz needed)."""
    argv = ["--mode", "mdgan", "--num_workers", "2", "--epochs", "4",
            "--batch_size", "2", "--chunk_size", "2", "--swap_interval", "0",
            "--log_interval", "0", "--checkpoint_interval", "2"]
    tr = MDGANTrainer(_cfg(tmp_path, argv))
    tr.train()
    tr.close()

    from mdgan_tpu.cli import generate

    out = tmp_path / "from_ckpt.png"
    rc = generate.main(["--dataset", "SyntheticMNIST",
                        "--checkpoint", str(tmp_path / "ckpt" / "mdgan.2.SyntheticMNIST"),
                        "--num", "4", "--nrow", "2", "--out", str(out)])
    assert rc == 0 and out.exists() and out.stat().st_size > 0


@pytest.mark.slow
def test_sigkill_recovery_via_cli(tmp_path):
    """Hard-failure recovery (SURVEY §5.3): SIGKILL the training process
    mid-run, restart with --resume, and the run completes from the last
    checkpoint with intact outputs — no corrupted checkpoint, no crash."""
    import os
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # PYTHONPATH is the repo ONLY — an inherited path carrying a TPU-plugin
    # sitecustomize (e.g. /root/.axon_site) would override JAX_PLATFORMS=cpu
    # and route this subprocess's device ops to real hardware
    env = dict(os.environ,
               PYTHONPATH=repo,
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               JAX_PLATFORMS="cpu")
    argv = [sys.executable, "-m", "mdgan_tpu.cli.train",
            "--mode", "mdgan", "--dataset", "SyntheticMNIST",
            "--max_examples", "256", "--compute_dtype", "float32",
            "--num_workers", "2", "--epochs", "60", "--batch_size", "4",
            "--swap_interval", "0", "--log_interval", "0",
            "--chunk_size", "5", "--checkpoint_interval", "10",
            "--log_dir", str(tmp_path / "logs"),
            "--image_dir", str(tmp_path / "imgs"),
            "--weights_dir", str(tmp_path / "weights"),
            "--checkpoint_dir", str(tmp_path / "ckpt")]

    proc = subprocess.Popen(argv, env=env, cwd=repo,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    ckpt_root = tmp_path / "ckpt" / "mdgan.2.SyntheticMNIST"
    deadline = time.time() + 480
    # wait until at least one checkpoint step exists, then pull the plug
    while time.time() < deadline:
        if proc.poll() is not None:
            raise AssertionError(
                f"process exited early:\n{proc.stdout.read().decode()}")
        # only FINALIZED orbax step dirs ('<step>'), not the async
        # '<step>.orbax-checkpoint-tmp-<ts>' in-progress dirs — killing
        # before finalize would silently test a from-scratch rerun
        steps = [p for p in ckpt_root.glob("[0-9]*")
                 if p.is_dir() and p.name.isdigit()]
        if steps:
            break
        time.sleep(0.5)
    else:
        raise AssertionError("no checkpoint appeared within deadline")  # noqa
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()

    out = subprocess.run(argv + ["--resume"], env=env, cwd=repo,
                         capture_output=True, timeout=560)
    assert out.returncode == 0, out.stdout.decode() + out.stderr.decode()
    summary = json.loads(out.stdout.decode().strip().splitlines()[-1])
    assert np.isfinite(summary["final_mean_d_loss"])
    # full CSV from the resumed process covers its rounds; weights exported
    assert (tmp_path / "weights" / "generator_final.npz").exists()
