"""Pins over the committed distributed-vs-standalone convergence comparison
(``artifacts/convergence/``) — the reference's central experiment
(``/root/reference/report/sections/discussion.tex:36-43``: distributed
MD-GAN converges worse/slower per round than the standalone baseline;
experiment inventory ``results.tex:4``), reproduced in-framework with
matched seeds and the standard 10k-sample FID protocol at the N=8 headline
run's exact cadence.  Recorded by ``scripts/record_artifacts.py --steps
convergence`` (one process, real TPU).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from mdgan_tpu.obs import spans as spans_lib

ROOT = Path(__file__).resolve().parent.parent
CONV = ROOT / "artifacts" / "convergence"

pytestmark = pytest.mark.skipif(
    not CONV.exists(), reason="convergence artifacts not recorded")

EPOCHS = 30000
# standard-protocol cadence shared with the headline artifact:
# every 10th eval event (log_interval 300) + the forced final round
STD_ROUNDS = list(range(0, EPOCHS, 3000)) + [EPOCHS - 1]


def _std_series(rows):
    return [(int(r["epoch"]), r["fid_standard"]) for r in rows
            if isinstance(r.get("fid_standard"), float)]


def test_standalone_run():
    out = CONV / "cifar10_standalone_r30000"
    if not out.exists():
        pytest.skip("standalone leg not recorded")
    summary = json.loads((out / "summary.json").read_text())
    assert summary["rounds"] == EPOCHS
    assert np.isfinite(summary["final_mean_g_loss"])
    rows = spans_lib.read_spans(out / "logs" / "CIFAR10.standalone.logs.csv")
    assert int(rows[-1]["epoch"]) == EPOCHS - 1
    series = _std_series(rows)
    assert [e for e, _ in series] == STD_ROUNDS
    assert all(np.isfinite(v) for _, v in series)
    # the reference standalone has NO final-round 5-sample eval
    # (standalone_gan.py:233); the final row is standard-only
    fids = [int(r["epoch"]) for r in rows if isinstance(r.get("fid"), float)]
    assert fids == list(range(0, EPOCHS, 300))


def test_mdgan_w2_run():
    out = CONV / "cifar10_w2_r30000"
    if not out.exists():
        pytest.skip("w2 leg not recorded")
    summary = json.loads((out / "summary.json").read_text())
    assert summary["rounds"] == EPOCHS
    assert np.isfinite(summary["final_mean_d_loss"])
    rows = spans_lib.read_spans(out / "logs" / "mdgan.2.CIFAR10.server.logs.csv")
    series = _std_series(rows)
    assert [e for e, _ in series] == STD_ROUNDS
    assert all(np.isfinite(v) for _, v in series)
    swaps = [r for r in rows if r.get("swap") in (True, "True", 1.0)]
    assert len(swaps) == 5  # rounds 5000..25000
    # worker CSVs: worker 1 plain, worker 2 gzipped (scale-run convention)
    w1 = spans_lib.read_spans(out / "logs" / "mdgan.2.CIFAR10.worker.1.logs.csv")
    assert len(w1) == EPOCHS
    w2 = spans_lib.read_spans(out / "logs" / "mdgan.2.CIFAR10.worker.2.logs.csv.gz")
    assert len(w2) == EPOCHS


def test_mdgan_w4_run():
    out = CONV / "cifar10_w4_r30000"
    if not out.exists():
        pytest.skip("w4 leg not recorded")
    summary = json.loads((out / "summary.json").read_text())
    assert summary["rounds"] == EPOCHS
    assert np.isfinite(summary["final_mean_d_loss"])
    rows = spans_lib.read_spans(out / "logs" / "mdgan.4.CIFAR10.server.logs.csv")
    series = _std_series(rows)
    assert [e for e, _ in series] == STD_ROUNDS
    assert all(np.isfinite(v) for _, v in series)
    swaps = [r for r in rows if r.get("swap") in (True, "True", 1.0)]
    assert len(swaps) == 5  # rounds 5000..25000
    w1 = spans_lib.read_spans(out / "logs" / "mdgan.4.CIFAR10.worker.1.logs.csv")
    assert len(w1) == EPOCHS
    for wid in (2, 3, 4):
        wk = spans_lib.read_spans(
            out / "logs" / f"mdgan.4.CIFAR10.worker.{wid}.logs.csv.gz")
        assert len(wk) == EPOCHS


def test_comparison_summary_and_figures():
    comp_path = CONV / "COMPARISON.json"
    if not comp_path.exists():
        pytest.skip("comparison summary not recorded")
    comp = json.loads(comp_path.read_text())
    expected = {"standalone", "mdgan_w2", "mdgan_w8"}
    if (CONV / "cifar10_w4_r30000").exists():
        expected.add("mdgan_w4")
    assert set(comp) == expected
    for label, rec in comp.items():
        assert [e for e, _ in rec["fid_standard"]] == STD_ROUNDS
        assert rec["best_fid_standard"] > 0
        assert rec["final_fid_standard"] > 0
        # summary values must be consistent with the embedded series
        vals = [v for _, v in rec["fid_standard"]]
        assert rec["best_fid_standard"] == pytest.approx(min(vals))
        assert rec["final_fid_standard"] == pytest.approx(vals[-1])
    # the w8 leg IS the committed headline run's series (same CSV)
    headline = spans_lib.read_spans(
        ROOT / "artifacts" / "headline" / "cifar10_w8_r30000" / "logs"
        / "mdgan.8.CIFAR10.server.logs.csv")
    assert [round(v, 2) for _, v in _std_series(headline)] == \
        [v for _, v in comp["mdgan_w8"]["fid_standard"]]
    figs = {p.name for p in (CONV / "figures").glob("compare.*.png")}
    assert {"compare.fid_standard.png", "compare.is_standard.png"} <= figs
