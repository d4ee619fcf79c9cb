"""Host-side training orchestration.

The thin Python shell around the jitted engines: chunk scheduling, swap-pair
sampling, FID/IS evaluation, image grids, span CSVs, and checkpointing.  This
replaces the reference's entire process choreography (``bootstrap.py`` spawn +
server/worker loops) with a single host loop driving on-device scans.

Round/event semantics follow the reference exactly:
  * swap at end of round e when ``e % swap_interval == 0 and e > 0`` and N > 1
    (``server.py:315-317``);
  * eval/log at end of round e when ``e % log_interval == 0 or e == epochs-1``
    (``server.py:336``).
Chunks of up to ``chunk_size`` rounds are fused into one device scan and are
clipped at event boundaries, so only a couple of distinct chunk lengths ever
compile.

Eval divergence note: the reference scores the images generated *during*
round e (pre-update generator of that round, ``server.py:337``); we regenerate
with round e's exact latents but the post-round generator — one Adam step
apart, and off the hot path.
"""

from __future__ import annotations

import logging
import time
from collections import deque
from concurrent.futures import Future, ThreadPoolExecutor
from pathlib import Path
from typing import Deque, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdgan_tpu.core import mesh as mesh_lib
from mdgan_tpu.core import prng
from mdgan_tpu.core.config import RunConfig
from mdgan_tpu.core.registry import get as get_spec
from mdgan_tpu.data.partitioner import shard_data
from mdgan_tpu.data.sampler import ShardSampler
from mdgan_tpu.engine.mdgan import MDGANEngine
from mdgan_tpu.engine.standalone import StandaloneEngine
from mdgan_tpu.obs import images as images_lib
from mdgan_tpu.obs import spans as spans_lib
from mdgan_tpu.ops import losses
from mdgan_tpu.utils import checkpoint as ckpt_lib

log = logging.getLogger("mdgan_tpu")


def _next_event(cur: int, epochs: int, swap_interval: int, log_interval: int,
                n_workers: int, checkpoint_interval: int = 0) -> int:
    """Smallest round e >= cur whose END triggers a host event."""
    candidates = [epochs - 1]
    if n_workers > 1 and swap_interval > 0:
        nxt = ((cur + swap_interval - 1) // swap_interval) * swap_interval
        if nxt == 0:
            nxt = swap_interval
        candidates.append(nxt)
    if log_interval > 0:
        candidates.append(((cur + log_interval - 1) // log_interval) * log_interval)
    if checkpoint_interval > 0:
        nxt = ((cur + checkpoint_interval - 1) // checkpoint_interval) * checkpoint_interval
        if nxt == 0:
            nxt = checkpoint_interval
        candidates.append(nxt)
    return min(c for c in candidates if c >= cur)


class MDGANTrainer:
    """End-to-end MD-GAN training run (the ``run-distributed.sh`` path)."""

    def __init__(self, run_cfg: RunConfig):
        self.cfg = run_cfg
        tc = run_cfg.train
        self.spec = get_spec(run_cfg.data.dataset)
        self.n = run_cfg.mesh.num_workers

        # the reference validates world-size parity at bootstrap
        # (bootstrap.py:163-164); fail before any compute, not at round 5000
        if self.n > 1 and tc.swap_interval > 0 and self.n % 2 != 0:
            raise ValueError(
                f"num_workers={self.n} must be even when discriminator swaps "
                "are enabled (set --swap_interval 0 to disable)")
        # The trainer's host loop assumes every device is addressable from
        # this process (it fetches worker-sharded metrics and dispatches eval
        # programs from background threads).  Multi-host (jax.distributed)
        # runs drive the ENGINE directly with per-process data and replicated
        # outputs — see tests/multihost_driver.py for the working pattern.
        if jax.process_count() > 1:
            raise NotImplementedError(
                "MDGANTrainer is single-controller; for multi-host runs "
                "drive MDGANEngine directly (tests/multihost_driver.py)")
        mesh = None
        if jax.device_count() > 1:
            mesh = mesh_lib.make_mesh(run_cfg.mesh)
        self.engine = MDGANEngine(self.spec, tc, self.n, mesh=mesh,
                                  mesh_cfg=run_cfg.mesh)

        data, labels = self.spec.load(run_cfg.data.data_dir,
                                      fallback=run_cfg.data.fallback,
                                      max_examples=run_cfg.data.max_examples)
        self.full_data = data
        shards, self.shard_indices = shard_data(
            data, self.n, iid=run_cfg.data.iid, seed=0
        )  # seed 0 == reference's device_generator.manual_seed(0), server.py:152-154
        self.shards = self.engine.shard_data(shards)
        self.sampler = ShardSampler(self.n, shards.shape[1], tc.batch_size, seed=0)
        self.state = self.engine.init_state(tc.seed)
        self.swap_rng = np.random.default_rng(tc.seed)

        name = f"mdgan.{self.n}.{run_cfg.data.dataset}"
        h, w, c = self.spec.shape
        self._payload_mb = tc.batch_size * h * w * c * 4 / 1024**2
        size_data = 2 * self._payload_mb
        size_fb = self.n * self._payload_mb
        self._row_template = lambda e: spans_lib.server_row_template(e, size_data, size_fb)
        self.logger = spans_lib.SpanLogger(
            Path(tc.log_dir) / f"{name}.server.logs.csv", self._row_template(0))
        self._worker_logs: List[spans_lib.SpanLogger] = []
        model_size = sum(
            np.prod(l.shape) * 4 for l in jax.tree.leaves(self.state.d.params)
        ) / self.n / 1024**2
        for r in range(self.n):
            tmpl = spans_lib.worker_row_template(0, float(model_size))
            self._worker_row_template = tmpl
            self._worker_logs.append(spans_lib.SpanLogger(
                Path(tc.log_dir) / f"{name}.worker.{r + 1}.logs.csv", tmpl))
        # fieldname -> column index, for the raw-row fast path
        self._worker_col_index = {
            k: i for i, k in enumerate(self._worker_row_template)}
        self._last_d_loss: Optional[float] = None

        self.ckpt = ckpt_lib.CheckpointManager(Path(tc.checkpoint_dir) / name)
        self._fid_tracker = None
        self._fid_std_tracker = None
        self._eval_history: List[Dict] = []
        if tc.resume and self.ckpt.latest_step() is not None:
            self._resume()
        # Host copy of the run's root PRNG key (the key is constant across
        # steps; a copy is required because donated device buffers may be
        # invalidated under background eval).
        self._key_host = np.asarray(jax.device_get(jax.random.key_data(self.state.key)))
        # Background FID/IS evaluation: one ordered worker thread; finished
        # server rows are held until their eval marks arrive (see _flush_rows).
        self._eval_pool: Optional[ThreadPoolExecutor] = None
        if tc.async_eval:
            self._eval_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="mdgan-eval")
        self._eval_backlog: Deque[Future] = deque()
        # (server row, eval future, chunk-metrics future) per finished chunk
        self._pending_rows: Deque[
            Tuple[Dict, Optional[Future], Optional[Future]]] = deque()
        # Background worker-CSV writer: row building + IO for the per-round
        # worker logs happen off the chunk critical path (the host loop is
        # otherwise idle-blocking on device_get -> write -> dispatch; at 30k
        # rounds the row work is ~2.6 s of serial host time).  One thread
        # keeps per-file row order; futures are drained at end of train().
        self._log_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="mdgan-log")
        self._log_futs: List[Future] = []
        # Jitted on-device pytree copy: donation-safe snapshots for the
        # background eval/checkpoint threads without blocking the host loop
        # on a device->host transfer (see _snapshot_g/_snapshot_state).
        self._copy_fn = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
        # Background checkpoint serialization: device_get of a full state
        # snapshot + orbax IO run off the critical path (measured 10-18 s of
        # host-loop stall per save on remote-transfer-bound runtimes).  One
        # thread keeps orbax save ordering; drained at end of train()/close().
        self._ckpt_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="mdgan-ckpt")
        self._ckpt_futs: List[Future] = []

    # ------------------------------------------------------------------

    def _resume(self) -> None:
        state, sampler_state, host_rng, step = self.ckpt.restore(self.state)
        self.state = state
        if self.engine.mesh is not None:
            self.state = self.engine.shard_state(self.state)
        if sampler_state is not None:
            self.sampler.load_state_dict(sampler_state)
        if host_rng is not None:
            self.swap_rng = ckpt_lib.restore_host_rng(host_rng)
        log.info("resumed from checkpoint at step %d", step)

    def _real_eval_batch(self, n_samples: int) -> np.ndarray:
        """Fixed real sample for FID, in [0,1] — reference keeps one seeded
        batch for the whole run (``server.py:128-140``)."""
        rng = np.random.default_rng(0)
        idx = rng.choice(len(self.full_data), size=min(n_samples, len(self.full_data)),
                         replace=False)
        return self.full_data[idx].astype(np.float32) / 255.0

    def _snapshot_g(self):
        """Device-side copy of the generator at the current round.

        A copy (not a reference) is mandatory: with ``donate=True`` the next
        training chunk invalidates the current state's buffers while the
        background eval is still reading the snapshot.  The copy is a jitted
        on-device op dispatched asynchronously, so the host loop never blocks
        on a device->host transfer here (that cost moves to the eval thread,
        which also saves re-uploading the params for ``sample_fn``)."""
        from mdgan_tpu.engine.state import NetState

        return NetState(params=self._copy_fn(self.state.g.params),
                        stats=self._copy_fn(self.state.g.stats), opt=None)

    def _snapshot_state(self):
        """Device-side copy of the FULL train state (checkpoint snapshot).

        Same donation-safety argument as :meth:`_snapshot_g`; lets checkpoint
        serialization (device_get + orbax IO) run on the background ckpt
        thread against an immutable snapshot while training continues."""
        return self._copy_fn(self.state)

    def _run_key(self) -> jax.Array:
        return jax.random.wrap_key_data(jnp.asarray(self._key_host))

    def _evaluate_work(self, epoch: int, g) -> Tuple[Dict, Dict]:
        """FID/IS + grid/weights IO for round ``epoch``'s generator snapshot.

        Runs on the eval thread (async) or inline (``--sync_eval``); touches
        only the snapshot + the engine's jitted samplers, never live training
        state.  Returns (CSV marks incl. fid/is span timestamps, eval record).
        Eval cadence matches the reference (``server.py:336-367``); images are
        regenerated with round-e's exact latents (see module docstring).
        """
        from mdgan_tpu.metrics import fid as fid_lib

        tc = self.cfg.train
        marks: Dict = {}
        kz = prng.for_step(self._run_key(), prng.LATENT, jnp.int32(epoch))
        num = self.engine.k * tc.batch_size
        z_images = self.engine.sample_fn(num)(g, kz)
        fakes01 = np.asarray(losses.denormalize_to_unit(z_images))

        images_lib.save_image_grid(fakes01, Path(tc.image_dir) / f"generated_epoch_{epoch}.png")

        n_eval = min(tc.n_samples, len(fakes01))
        if self._fid_tracker is None:
            real01 = self._real_eval_batch(tc.n_samples)
            images_lib.save_image_grid(real01, Path(tc.image_dir) / "real_images.png")
            self._fid_tracker = fid_lib.FIDTracker(real01)
        marks["start.is"] = time.time()
        is_mean, _ = fid_lib.inception_score(fakes01[:n_eval], splits=1)
        marks["end.is"] = time.time()
        marks["start.fid"] = time.time()
        fid = self._fid_tracker.score(fakes01[:n_eval])
        marks["end.fid"] = time.time()
        marks.update(fid=fid, **{"is": is_mean})

        result = {"epoch": epoch, "fid": fid, "is": is_mean}
        if tc.eval_n_samples > 0:
            result.update(self._evaluate_standard(epoch, g))
            marks.update(fid_standard=result["fid_standard"],
                         is_standard=result["is_standard"])
        # per-eval generator export (reference weights cadence) rides the log
        # IO thread: the device_get + npz write overlap with the next eval's
        # metric computation instead of serializing the eval queue (g is an
        # immutable device-side snapshot, so any thread may read it)
        self._log_futs.append(self._log_pool.submit(
            ckpt_lib.save_weights_only,
            Path(tc.weights_dir) / f"generator_{epoch}.npz", g.params, g.stats))
        log.info("eval @ %d: fid=%.2f is=%.3f", epoch, fid, is_mean)
        return marks, result

    def _evaluate_standard(self, epoch: int, g) -> Dict:
        """Standard-protocol FID/IS: eval_n_samples fakes vs eval_n_samples
        reals, IS over 10 splits — comparable to literature (BASELINE.md), as
        opposed to the reference's 5-sample logging."""
        from mdgan_tpu.metrics import fid as fid_lib

        tc = self.cfg.train
        n = tc.eval_n_samples
        if self._fid_std_tracker is None:
            rng = np.random.default_rng(1)
            idx = rng.choice(len(self.full_data), min(n, len(self.full_data)),
                             replace=False)
            self._fid_std_tracker = fid_lib.FIDTracker(
                self.full_data[idx].astype(np.float32) / 255.0)
        batch = 256
        fakes = []
        key = prng.for_step(self._run_key(), prng.EVAL, jnp.int32(epoch))
        for i in range(0, n, batch):
            num = min(batch, n - i)
            out = self.engine.sample_fn(num)(g, jax.random.fold_in(key, i))
            fakes.append(np.asarray(losses.denormalize_to_unit(out)))
        fakes01 = np.concatenate(fakes)
        fid_std = self._fid_std_tracker.score(fakes01)
        is_std, is_std_dev = fid_lib.inception_score(fakes01, splits=10)
        log.info("standard eval @ %d (n=%d): fid=%.2f is=%.3f±%.3f",
                 epoch, n, fid_std, is_std, is_std_dev)
        return {"fid_standard": fid_std, "is_standard": is_std,
                "is_standard_std": is_std_dev}

    def _write_worker_rows(self, metrics_dev, t0: float, e: int,
                           swapped_with, server_row: Optional[Dict]) -> None:
        """Fetch one chunk's metrics and append its per-round worker CSV rows.

        Runs on the single background log thread (order-preserving).  The
        ``device_get`` of the chunk metrics happens HERE, so the device->host
        transfer (a full round trip on remote/tunneled runtimes) overlaps the
        next chunk's compute instead of serializing the host loop; the main
        loop throttles itself to a bounded number of un-fetched chunks.
        Completion time is stamped back onto the held ``server_row`` (written
        only after this returns — see ``_flush_rows``), keeping the
        epoch/calc_gradients spans equal to the real chunk wall time.

        Device rounds fuse into one scan, so per-round epoch/calc_gradients
        spans are synthesized as equal slices of the measured chunk span;
        sent/recv are the per-round payload equivalents the reference
        measures on the wire (worker.py:119-126: recv = 2 fake batches,
        sent = feedback).  Rows are built as value-lists in fieldname order
        for the raw-csv fast path (see ``SpanLogger.write_raw_rows``).
        """
        d_losses = np.asarray(metrics_dev["mean_d_loss"])  # (clen, N); blocks
        t1 = time.time()
        n_rows = d_losses.shape[0]
        self._last_d_loss = float(np.mean(d_losses[-1]))
        # With up to 2 chunks dispatched ahead, t0 (dispatch) predates this
        # chunk's actual execution window.  The device runs chunks serially,
        # so the previous chunk's completion is this one's true start: clamp
        # to keep per-chunk rows non-overlapping and span stats honest.
        t0 = max(t0, getattr(self, "_prev_chunk_end", 0.0))
        self._prev_chunk_end = t1
        if server_row is not None:
            server_row["start.epoch"] = t0
            server_row["start.calc_gradients"] = t0
            server_row["start.epoch_calculation"] = t0
            server_row["end.calc_gradients"] = t1
            server_row["end.epoch_calculation"] = t1
            server_row["end.epoch"] = max(t1, server_row.get("end.epoch") or t1)
        dt = (t1 - t0) / max(n_rows, 1)
        tmpl = self._worker_row_template
        col = self._worker_col_index
        base = list(tmpl.values())
        i_ep = col["epoch"]
        i_se, i_sc = col["start.epoch"], col["start.calc_gradients"]
        i_ee, i_ec = col["end.epoch"], col["end.calc_gradients"]
        i_loss = col["mean_d_loss"]
        i_recv, i_sent, i_swap = col["size.recv"], col["size.sent"], col["swap_with"]
        size_recv = 2 * self._payload_mb
        size_sent = self._payload_mb
        losses = d_losses.astype(float)
        for r in range(self.n):
            rows = []
            for t in range(n_rows):
                row = base.copy()
                row[i_ep] = e - n_rows + 1 + t
                row[i_se] = row[i_sc] = t0 + t * dt
                row[i_ee] = row[i_ec] = t0 + (t + 1) * dt
                row[i_loss] = losses[t, r]
                row[i_recv] = size_recv
                row[i_sent] = size_sent
                rows.append(row)
            if swapped_with is not None:
                row = rows[-1]  # the swap lands on round e, the chunk's last
                row[i_swap] = int(swapped_with[r]) + 1
                # swap moves a full discriminator state dict each way
                row[i_recv] = size_recv + tmpl["size.model"]
                row[i_sent] = size_sent + tmpl["size.model"]
            self._worker_logs[r].write_raw_rows(rows)

    @staticmethod
    def _drain_futures(futs: List[Future]) -> None:
        """Wait for every future; re-raise the first error; clear the list."""
        for fut in futs:
            fut.result()
        futs.clear()

    def _drain_worker_rows(self) -> None:
        """Wait for all queued worker-row batches; re-raise any writer error."""
        self._drain_futures(self._log_futs)

    def _flush_rows(self, block: bool = False) -> None:
        """Write held server rows whose eval marks AND chunk-metrics fetch
        have arrived, in round order.  ``block=True`` drains everything
        (end of run)."""
        while self._pending_rows:
            row, fut, metrics_fut = self._pending_rows[0]
            if metrics_fut is not None:
                # the log thread stamps the row's real chunk-completion spans
                if not block and not metrics_fut.done():
                    return
                metrics_fut.result()
            if fut is not None:
                if not block and not fut.done():
                    return
                marks, result = fut.result()
                row.update(marks)
                self._eval_history.append(result)
            self._pending_rows.popleft()
            self.logger.write_row(row)

    # ------------------------------------------------------------------

    def train(self) -> Dict:
        tc = self.cfg.train
        cur = int(self.state.step)
        t_start = time.time()
        rounds_done = 0
        inflight: Deque[Future] = deque()  # un-fetched chunk metrics
        while cur < tc.epochs:
            event_end = _next_event(cur, tc.epochs, tc.swap_interval, tc.log_interval,
                                    self.n, tc.checkpoint_interval)
            clen = min(tc.chunk_size, event_end - cur + 1, tc.epochs - cur)
            idx = jnp.asarray(self.sampler.next_chunk(clen))

            self.logger.begin_row(self._row_template(cur))
            with self.logger.span("epoch_calculation"):
                with self.logger.span("generate_data"):
                    pass  # fused into the jitted step (see module docstring)
                with self.logger.span("calc_gradients"):
                    # async dispatch; the log thread fetches the metrics and
                    # back-fills this row's end timestamps (_write_worker_rows)
                    t_chunk0 = time.time()
                    self.state, chunk_metrics_dev = self.engine.chunk_fn(clen)(
                        self.state, self.shards, idx)
            cur += clen
            rounds_done += clen
            e = cur - 1  # just-completed round
            # label the row by the round whose END it records (the reference
            # writes one row at the end of round e, server.py:370) — eval/swap
            # marks then sit on the round they belong to
            self.logger.mark(epoch=e)

            swapped_with = None
            if self.n > 1 and tc.swap_interval > 0 and e > 0 and e % tc.swap_interval == 0:
                with self.logger.span("swap"):
                    perm = self.engine.sample_swap_perm(self.swap_rng)
                    self.state = self.engine.swap(self.state, perm)
                self.logger.mark(swap=True)
                swapped_with = perm

            eval_fut: Optional[Future] = None
            if (tc.log_interval > 0 and e % tc.log_interval == 0) or e == tc.epochs - 1:
                g_snap = self._snapshot_g()
                if self._eval_pool is not None:
                    # backpressure: each queued eval holds a device-side
                    # generator snapshot; if eval wall time exceeds the
                    # cadence, block rather than accumulate snapshots in HBM
                    while len(self._eval_backlog) >= 4:
                        self._eval_backlog.popleft().result()
                    eval_fut = self._eval_pool.submit(self._evaluate_work, e, g_snap)
                    self._eval_backlog.append(eval_fut)
                else:
                    marks, result = self._evaluate_work(e, g_snap)
                    self.logger.mark(**marks)
                    self._eval_history.append(result)
            if (tc.checkpoint_interval > 0 and e > 0
                    and e % tc.checkpoint_interval == 0) or e == tc.epochs - 1:
                # repurposed span: ckpt handoff (on-device snapshot + submit).
                # Serialization itself (device_get + orbax IO) runs on the
                # ckpt thread against the immutable snapshot, so the span now
                # measures only the synchronous cost the round actually pays.
                with self.logger.span("agg_gradients"):
                    snap = self._snapshot_state()
                    self._ckpt_futs.append(self._ckpt_pool.submit(
                        self.ckpt.save, e, snap,
                        self.sampler.state_dict(),
                        ckpt_lib.host_rng_state(self.swap_rng)))
            # hold the row until its metrics fetch + (async) eval marks land;
            # rows flush in strict round order either way.  Worker-CSV rows
            # (one per ROUND, reference worker.py:286) are built and written
            # by the log thread after it fetches this chunk's metrics.
            row = self.logger.take_row()
            metrics_fut = self._log_pool.submit(
                self._write_worker_rows, chunk_metrics_dev, t_chunk0, e,
                swapped_with, row)
            self._log_futs.append(metrics_fut)
            self._pending_rows.append((row, eval_fut, metrics_fut))
            self._flush_rows(block=False)

            # pipeline throttle: at most 2 chunks may be dispatched ahead of
            # their metrics fetch (bounds device queue depth + host memory)
            inflight.append(metrics_fut)
            if len(inflight) > 2:
                inflight.popleft().result()

        # drain background evals + worker-row writes + checkpoint saves so
        # summary/CSVs/checkpoints are complete and ordered before train()
        # returns
        self._flush_rows(block=True)
        self._eval_backlog.clear()
        self._drain_worker_rows()
        self._drain_futures(self._ckpt_futs)

        # final weights exports (reference server.py:372-375, worker.py:289-293)
        ckpt_lib.save_weights_only(Path(tc.weights_dir) / "generator_final.npz",
                                   self.state.g.params, self.state.g.stats)
        d_params = jax.device_get(self.state.d.params)
        d_stats = jax.device_get(self.state.d.stats)
        for r in range(self.n):
            ckpt_lib.save_weights_only(
                Path(tc.weights_dir) / f"worker_{r + 1}" / "discriminator.npz",
                jax.tree.map(lambda a: a[r], d_params),
                jax.tree.map(lambda a: a[r], d_stats))

        wall = time.time() - t_start
        summary = {
            "rounds": rounds_done,
            "wall_time_s": wall,
            "steps_per_sec": rounds_done / wall if wall > 0 else 0.0,
            "final_mean_d_loss": self._last_d_loss,
            "evals": self._eval_history,
        }
        log.info("done: %s", summary)
        return summary

    def close(self):
        if self._eval_pool is not None:
            self._eval_pool.shutdown(wait=True)
            self._eval_pool = None
        try:
            self._flush_rows(block=True)
        except Exception:  # an eval future may re-raise; don't mask close()
            log.exception("pending eval failed during close()")
        self._log_pool.shutdown(wait=True)  # drain queued worker-row writes
        try:
            self._drain_worker_rows()
        except Exception:
            log.exception("pending worker-row write failed during close()")
        self._ckpt_pool.shutdown(wait=True)  # drain queued checkpoint saves
        for fut in self._ckpt_futs:
            try:
                fut.result()
            except Exception:
                log.exception("pending checkpoint save failed during close()")
        self._ckpt_futs.clear()
        self.logger.close()
        for wl in self._worker_logs:
            wl.close()
        self.ckpt.close()


class StandaloneTrainer:
    """Single-device baseline run (the ``run-standalone.sh`` path)."""

    def __init__(self, run_cfg: RunConfig):
        self.cfg = run_cfg
        tc = run_cfg.train
        self.spec = get_spec(run_cfg.data.dataset)
        self.engine = StandaloneEngine(self.spec, tc)
        data, _ = self.spec.load(run_cfg.data.data_dir,
                                 fallback=run_cfg.data.fallback,
                                 max_examples=run_cfg.data.max_examples)
        self.full_data = data
        self.data = jnp.asarray(data)
        self.sampler = ShardSampler(1, len(data), tc.batch_size, seed=0)
        self.state = self.engine.init_state(tc.seed)
        name = f"{run_cfg.data.dataset}.standalone"
        self.logger = spans_lib.SpanLogger(
            Path(tc.log_dir) / f"{name}.logs.csv",
            spans_lib.server_row_template(0, 0.0, 0.0))
        self._fid_tracker = None
        self._eval_history: List[Dict] = []

    def train(self) -> Dict:
        from mdgan_tpu.metrics import fid as fid_lib

        tc = self.cfg.train
        cur = int(self.state.step)
        metrics = None
        t_start = time.time()
        while cur < tc.epochs:
            event_end = _next_event(cur, tc.epochs, 0, tc.log_interval, 1)
            clen = min(tc.chunk_size, event_end - cur + 1, tc.epochs - cur)
            idx = jnp.asarray(self.sampler.next_chunk(clen)[:, 0, :])
            self.logger.begin_row(spans_lib.server_row_template(cur, 0.0, 0.0))
            with self.logger.span("calc_gradients"):
                self.state, metrics = self.engine.chunk_fn(clen)(
                    self.state, self.data, idx)
                metrics = jax.device_get(metrics)
            cur += clen
            e = cur - 1
            # label the row by the round whose END it records (reference
            # standalone_gan.py logs at end of round e), matching MDGANTrainer
            self.logger.mark(epoch=e)
            if (tc.log_interval > 0 and e % tc.log_interval == 0) or e == tc.epochs - 1:
                fakes = self.engine.sample_fn(max(16, tc.n_samples))(
                    self.state.g, prng.for_step(self.state.key, prng.EVAL, jnp.int32(e)))
                fakes01 = np.asarray(losses.denormalize_to_unit(fakes))
                images_lib.save_image_grid(
                    fakes01, Path(tc.image_dir) / f"fake_samples_{e}.png")
                if self._fid_tracker is None:
                    rng = np.random.default_rng(0)
                    ridx = rng.choice(len(self.full_data),
                                      min(tc.n_samples, len(self.full_data)), replace=False)
                    self._fid_tracker = fid_lib.FIDTracker(
                        self.full_data[ridx].astype(np.float32) / 255.0)
                with self.logger.span("is"):
                    is_mean, _ = fid_lib.inception_score(fakes01[: tc.n_samples], splits=1)
                with self.logger.span("fid"):
                    fid = self._fid_tracker.score(fakes01[: tc.n_samples])
                self.logger.mark(fid=fid, **{"is": is_mean})
                self._eval_history.append({"epoch": e, "fid": fid, "is": is_mean})
            self.logger.end_row()

        ckpt_lib.save_weights_only(
            Path(tc.weights_dir) / f"netG_epoch_{tc.epochs - 1}.npz",
            self.state.g.params, self.state.g.stats)
        ckpt_lib.save_weights_only(
            Path(tc.weights_dir) / f"netD_epoch_{tc.epochs - 1}.npz",
            self.state.d.params, self.state.d.stats)
        wall = time.time() - t_start
        return {
            "rounds": cur,
            "wall_time_s": wall,
            "steps_per_sec": cur / wall if wall > 0 else 0.0,
            "final_mean_d_loss": float(metrics["mean_d_loss"][-1]) if metrics else None,
            "final_mean_g_loss": float(metrics["mean_g_loss"][-1]) if metrics else None,
            "evals": self._eval_history,
        }

    def close(self):
        self.logger.close()
