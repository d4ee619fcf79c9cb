"""Span-CSV logger and image-grid tests (reference schema parity)."""

import numpy as np
import pytest

from mdgan_tpu.obs import images as images_lib
from mdgan_tpu.obs import spans as spans_lib


def test_span_logger_roundtrip(tmp_path):
    path = tmp_path / "server.logs.csv"
    tmpl = spans_lib.server_row_template(0, 0.234, 0.117)
    logger = spans_lib.SpanLogger(path, tmpl)
    for e in range(3):
        logger.begin_row(spans_lib.server_row_template(e, 0.234, 0.117))
        with logger.span("calc_gradients"):
            pass
        logger.mark(fid=100.0 + e, **{"is": 2.0})
        logger.end_row()
    logger.close()

    rows = spans_lib.read_spans(path)
    assert len(rows) == 3
    assert rows[0]["size.data"] == 0.234
    assert rows[2]["fid"] == 102.0
    durs = spans_lib.span_durations(rows)
    assert len(durs["calc_gradients"]) == 3
    assert len(durs["epoch"]) == 3
    assert all(d >= 0 for d in durs["epoch"])


def test_server_schema_matches_reference_columns():
    """The reference server CSV columns (``server.py:179-208``) must all exist."""
    tmpl = spans_lib.server_row_template(0, 1.0, 1.0)
    for col in ["epoch", "start.epoch", "end.epoch", "start.epoch_calculation",
                "end.epoch_calculation", "start.send_data", "end.send_data",
                "start.recv_data", "end.recv_data", "start.calc_gradients",
                "end.calc_gradients", "start.agg_gradients", "end.agg_gradients",
                "start.generate_data", "end.generate_data", "fid", "is",
                "start.fid", "end.fid", "start.is", "end.is", "size.data",
                "size.feedback", "start.swap", "end.swap", "swap",
                "size.sent", "size.recv"]:
        assert col in tmpl, col


def test_server_superset_columns_roundtrip(tmp_path):
    """Rebuild-superset columns (fid_standard/is_standard + the checkpoint
    span) sit AFTER the reference schema and must round-trip through the
    logger/parser like any reference op."""
    tmpl = spans_lib.server_row_template(0, 1.0, 1.0)
    keys = list(tmpl)
    for col in ("fid_standard", "is_standard", "start.checkpoint",
                "end.checkpoint"):
        assert col in tmpl, col
        # superset columns come after every reference column
        assert keys.index(col) > keys.index("size.recv")

    path = tmp_path / "server.logs.csv"
    logger = spans_lib.SpanLogger(path, tmpl)
    logger.begin_row(spans_lib.server_row_template(0, 1.0, 1.0))
    with logger.span("checkpoint"):
        pass
    logger.mark(fid_standard=42.5, is_standard=3.25)
    logger.end_row()
    logger.close()
    rows = spans_lib.read_spans(path)
    assert rows[0]["fid_standard"] == 42.5
    assert rows[0]["is_standard"] == 3.25
    durs = spans_lib.span_durations(rows)
    assert len(durs["checkpoint"]) == 1 and durs["checkpoint"][0] >= 0


def test_straggler_column_is_opt_in(tmp_path):
    """``n_feedbacks`` appears only for straggler runs (parity runs keep the
    golden-pinned schema byte-stable) and flows through analyze."""
    assert "n_feedbacks" not in spans_lib.server_row_template(0, 1.0, 1.0)
    tmpl = spans_lib.server_row_template(0, 1.0, 1.0, straggler=True)
    assert list(tmpl)[-1] == "n_feedbacks"  # appended after every other column

    path = tmp_path / "server.logs.csv"
    logger = spans_lib.SpanLogger(path, tmpl)
    for nf in (3, 1, 4):
        logger.begin_row(spans_lib.server_row_template(0, 1.0, 1.0, straggler=True))
        logger.mark(n_feedbacks=nf)
        logger.end_row()
    logger.close()
    rows = spans_lib.read_spans(path)
    assert [r["n_feedbacks"] for r in rows] == [3.0, 1.0, 4.0]

    from mdgan_tpu.cli.analyze import analyze_file

    rep = analyze_file(path)
    assert rep["n_feedbacks"] == {"mean": pytest.approx(8 / 3),
                                  "min": 1, "max": 4}


def test_worker_schema_matches_reference_columns():
    """Reference worker CSV columns (``worker.py:129-152``)."""
    tmpl = spans_lib.worker_row_template(0, 2.53)
    for col in ["epoch", "start.epoch", "end.epoch", "start.calc_gradients",
                "end.calc_gradients", "start.recv_data", "end.recv_data",
                "start.send", "end.send", "start.swap_recv_instruction",
                "end.swap_recv_instruction", "start.load_state_dict",
                "end.load_state_dict", "start.swap_recv", "end.swap_recv",
                "start.swap_send", "end.swap_send", "swap_with", "mean_d_loss",
                "size.model", "size.sent", "size.recv"]:
        assert col in tmpl, col


def test_make_grid_layout():
    imgs = np.zeros((6, 4, 4, 3), np.float32)
    imgs[1] = 1.0
    grid = images_lib.make_grid(imgs, nrow=4)
    assert grid.shape == (8, 16, 3)  # 2 rows x 4 cols of 4x4
    assert grid[0:4, 4:8].min() == 1.0  # second image slot
    assert grid[0:4, 0:4].max() == 0.0


def test_save_and_load_png(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32)
    path = tmp_path / "grid.png"
    images_lib.save_image_grid(imgs, path, nrow=2)
    assert path.exists() and path.stat().st_size > 100
    try:
        back = images_lib.load_png(path)
    except NotImplementedError:
        return
    assert back.shape == (16, 16, 3)
    expected = (images_lib.make_grid(imgs, nrow=2) * 255).round().astype(np.uint8)
    np.testing.assert_array_equal(back, expected)


def test_grayscale_png(tmp_path):
    imgs = np.linspace(0, 1, 2 * 8 * 8, dtype=np.float32).reshape(2, 8, 8, 1)
    path = tmp_path / "gray.png"
    images_lib.save_image_grid(imgs, path, nrow=2)
    assert path.exists()


def test_host_monitor_samples(tmp_path):
    import time

    from mdgan_tpu.obs.hostmon import HostMonitor

    path = tmp_path / "host.csv"
    mon = HostMonitor(path, period_s=0.2).start()
    time.sleep(0.9)
    mon.stop()
    rows = list(__import__("csv").DictReader(open(path)))
    assert len(rows) >= 2
    assert 0.0 <= float(rows[-1]["cpu_percent"]) <= 100.0
    assert float(rows[-1]["mem_total_mb"]) > 100


def test_plot_figures_from_repo_and_reference_csvs(tmp_path):
    """analyze --plot must render every figure kind — incl. the op-timeline
    Gantt and payload-size figures (reference plot_logs.ipynb cells 14-24) —
    from a freshly-written repo CSV AND from a reference-committed CSV
    (proving the schema round-trips)."""
    import time
    from pathlib import Path

    from mdgan_tpu.cli import analyze

    # repo CSV: synthesize a few rows with spans, sizes, and metrics
    path = tmp_path / "mdgan.2.Synth.server.logs.csv"
    logger = spans_lib.SpanLogger(path, spans_lib.server_row_template(0, 0.234, 0.117))
    for e in range(4):
        logger.begin_row(spans_lib.server_row_template(e, 0.234, 0.117))
        with logger.span("calc_gradients"):
            time.sleep(0.001)
        logger.mark(fid=100.0 + e, **{"is": 2.0}, **{"size.sent": 0.5, "size.recv": 0.3})
        logger.end_row()
    logger.close()
    out = tmp_path / "plots"
    assert analyze.main([str(path), "--plot", str(out)]) == 0
    assert (out / "mdgan.2.Synth.server.ops.png").exists()
    assert (out / "mdgan.2.Synth.server.sizes.png").exists()
    assert (out / "timeline.png").exists()

    ref = Path("/root/reference/src/logs")
    if not ref.exists():
        return  # reference tree only present in the build environment
    out2 = tmp_path / "refplots"
    rc = analyze.main([
        str(ref / "mdgan.2.CIFAR10.server.logs.csv"),
        str(ref / "mdgan.2.CIFAR10.worker.1.logs.csv"),
        "--plot", str(out2), "--timeline_rounds", "5",
    ])
    assert rc == 0
    assert (out2 / "mdgan.2.CIFAR10.server.ops.png").exists()
    assert (out2 / "mdgan.2.CIFAR10.server.sizes.png").exists()
    assert (out2 / "mdgan.2.CIFAR10.worker.1.ops.png").exists()
    assert (out2 / "timeline.png").exists()


def test_analyze_reads_gzipped_worker_csvs(tmp_path):
    """The committed scale artifacts gzip workers 2..N; the WHOLE analyze
    path (is_host_csv classification, per-op stats, figures) must open
    .csv.gz transparently, not just spans.read_spans (r4 review: is_host_csv
    decoded the gzip magic byte as utf-8 and crashed)."""
    import gzip
    import shutil
    import time
    from pathlib import Path

    from mdgan_tpu.cli import analyze

    path = tmp_path / "mdgan.2.Synth.worker.2.logs.csv"
    logger = spans_lib.SpanLogger(path, spans_lib.worker_row_template(0, 2.53))
    for e in range(3):
        logger.begin_row(spans_lib.worker_row_template(e, 2.53))
        with logger.span("calc_gradients"):
            time.sleep(0.001)
        logger.mark(mean_d_loss=0.5)
        logger.end_row()
    logger.close()
    gz = tmp_path / "mdgan.2.Synth.worker.2.logs.csv.gz"
    with open(path, "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)

    assert not analyze.is_host_csv(gz)
    out = tmp_path / "plots"
    assert analyze.main([str(gz), "--plot", str(out), "--json"]) == 0
    assert (out / "mdgan.2.Synth.worker.2.ops.png").exists()

    # and on a real committed scale artifact, when present
    committed = Path(__file__).resolve().parent.parent / (
        "artifacts/scale/cifar10_w20_r10000/logs/"
        "mdgan.20.CIFAR10.worker.2.logs.csv.gz")
    if committed.exists():
        rep = analyze.analyze_file(committed)
        assert rep["rows"] == 10000


def test_analyze_compare_overlays_runs(tmp_path):
    """--compare overlays the FID/loss curves of several runs in one figure
    per metric (the reference report's standalone-vs-N-workers comparison
    figures, produced by plot_logs.ipynb across runs' CSVs)."""
    from mdgan_tpu.cli import analyze

    paths = []
    for tag, base_fid in (("mdgan.2.Synth.server", 100.0),
                          ("mdgan.8.Synth.server", 120.0)):
        path = tmp_path / f"{tag}.logs.csv"
        logger = spans_lib.SpanLogger(
            path, spans_lib.server_row_template(0, 0.2, 0.1))
        for e in range(3):
            logger.begin_row(spans_lib.server_row_template(e, 0.2, 0.1))
            logger.mark(fid=base_fid - e, **{"is": 2.0 + e})
            logger.end_row()
        logger.close()
        paths.append(str(path))

    out = tmp_path / "plots"
    assert analyze.main(paths + ["--plot", str(out), "--compare"]) == 0
    assert (out / "compare.fid.png").exists()
    assert (out / "compare.is.png").exists()
    # metrics absent from every run produce no figure
    assert not (out / "compare.n_feedbacks.png").exists()
    # a single-run compare is a no-op (plot_file already covers one curve)
    out1 = tmp_path / "plots1"
    assert analyze.main([paths[0], "--plot", str(out1), "--compare"]) == 0
    assert not (out1 / "compare.fid.png").exists()

    # identically-named CSVs in different run dirs (the common layout) must
    # get unique legend labels (shortest distinguishing path suffix)
    import shutil

    for run in ("runA", "runB"):
        (tmp_path / run / "logs").mkdir(parents=True)
        shutil.copy(paths[0], tmp_path / run / "logs" / "server.logs.csv")
    from pathlib import Path as _P

    out2 = tmp_path / "plots2"
    assert analyze.plot_compare(
        [tmp_path / "runA" / "logs" / "server.logs.csv",
         tmp_path / "runB" / "logs" / "server.logs.csv"], _P(out2))
    assert (out2 / "compare.fid.png").exists()

    # gzipped CSVs (the committed scale-run worker inventory) get the same
    # clean stem as plain ones — no dangling ".gz" in legend labels
    import gzip

    gz = tmp_path / "runA" / "logs" / "worker.logs.csv.gz"
    with open(paths[0], "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    labels = analyze._compare_labels(
        [tmp_path / "runA" / "logs" / "server.logs.csv", gz])
    assert labels == ["server", "worker"]


def test_analyze_host_metrics_csv(tmp_path):
    """analyze must recognize hostmon CSVs (gce_stats.ipynb analogue): summary
    stats + cpu/mem/net-rate figure, alongside span CSVs untouched."""
    import time

    from mdgan_tpu.cli import analyze
    from mdgan_tpu.obs.hostmon import HostMonitor

    path = tmp_path / "host.csv"
    mon = HostMonitor(path, period_s=0.05).start()
    time.sleep(0.4)
    mon.stop()

    assert analyze.is_host_csv(path)
    rep = analyze.analyze_host_file(path)
    assert rep["kind"] == "host_metrics" and rep["rows"] >= 3
    assert 0 <= rep["cpu_mean_pct"] <= 100 * 256  # bounded sanity
    assert rep["mem_max_mb"] > 0

    rc = analyze.main([str(path), "--plot", str(tmp_path / "plots"), "--json"])
    assert rc == 0
    assert (tmp_path / "plots" / "host.host.png").exists()
