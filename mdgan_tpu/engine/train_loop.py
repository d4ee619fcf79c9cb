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
from pathlib import Path
from typing import Dict, List

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
        size_data = 2 * tc.batch_size * h * w * c * 4 / 1024**2
        size_fb = self.n * tc.batch_size * h * w * c * 4 / 1024**2
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

        self.ckpt = ckpt_lib.CheckpointManager(Path(tc.checkpoint_dir) / name)
        self._fid_tracker = None
        self._fid_std_tracker = None
        self._eval_history: List[Dict] = []
        if tc.resume and self.ckpt.latest_step() is not None:
            self._resume()

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

    def _evaluate(self, epoch: int) -> Dict:
        from mdgan_tpu.metrics import fid as fid_lib

        tc = self.cfg.train
        # regenerate with round-e latents (see module docstring)
        kz = prng.for_step(self.state.key, prng.LATENT, jnp.int32(epoch))
        num = self.engine.k * tc.batch_size
        z_images = self.engine.sample_fn(num)(self.state.g, kz)
        fakes01 = np.asarray(losses.denormalize_to_unit(z_images))

        images_lib.save_image_grid(fakes01, Path(tc.image_dir) / f"generated_epoch_{epoch}.png")

        n_eval = min(tc.n_samples, len(fakes01))
        if self._fid_tracker is None:
            real01 = self._real_eval_batch(tc.n_samples)
            images_lib.save_image_grid(real01, Path(tc.image_dir) / "real_images.png")
            self._fid_tracker = fid_lib.FIDTracker(real01)
        with self.logger.span("is"):
            is_mean, _ = fid_lib.inception_score(fakes01[:n_eval], splits=1)
        with self.logger.span("fid"):
            fid = self._fid_tracker.score(fakes01[:n_eval])
        self.logger.mark(fid=fid, **{"is": is_mean})

        result = {"epoch": epoch, "fid": fid, "is": is_mean}
        if tc.eval_n_samples > 0:
            result.update(self._evaluate_standard(epoch))
            self.logger.mark(fid_standard=result["fid_standard"],
                             is_standard=result["is_standard"])
        ckpt_lib.save_weights_only(
            Path(tc.weights_dir) / f"generator_{epoch}.npz",
            self.state.g.params, self.state.g.stats)
        self._eval_history.append(result)
        log.info("eval @ %d: fid=%.2f is=%.3f", epoch, fid, is_mean)
        return result

    def _evaluate_standard(self, epoch: int) -> Dict:
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
        key = prng.for_step(self.state.key, prng.EVAL, jnp.int32(epoch))
        for i in range(0, n, batch):
            num = min(batch, n - i)
            out = self.engine.sample_fn(num)(self.state.g, jax.random.fold_in(key, i))
            fakes.append(np.asarray(losses.denormalize_to_unit(out)))
        fakes01 = np.concatenate(fakes)
        fid_std = self._fid_std_tracker.score(fakes01)
        is_std, is_std_dev = fid_lib.inception_score(fakes01, splits=10)
        log.info("standard eval @ %d (n=%d): fid=%.2f is=%.3f±%.3f",
                 epoch, n, fid_std, is_std, is_std_dev)
        return {"fid_standard": fid_std, "is_standard": is_std,
                "is_standard_std": is_std_dev}

    # ------------------------------------------------------------------

    def train(self) -> Dict:
        tc = self.cfg.train
        cur = int(self.state.step)
        chunk_metrics = None
        t_start = time.time()
        rounds_done = 0
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
                    self.state, chunk_metrics = self.engine.chunk_fn(clen)(
                        self.state, self.shards, idx)
                    # device_get (not block_until_ready) guarantees completion
                    # on remote/tunneled TPU runtimes
                    chunk_metrics = jax.device_get(chunk_metrics)
            cur += clen
            rounds_done += clen
            e = cur - 1  # just-completed round

            swapped_with = None
            if self.n > 1 and tc.swap_interval > 0 and e > 0 and e % tc.swap_interval == 0:
                with self.logger.span("swap"):
                    perm = self.engine.sample_swap_perm(self.swap_rng)
                    self.state = self.engine.swap(self.state, perm)
                self.logger.mark(swap=True)
                swapped_with = perm

            if (tc.log_interval > 0 and e % tc.log_interval == 0) or e == tc.epochs - 1:
                self._evaluate(e)
            if (tc.checkpoint_interval > 0 and e > 0
                    and e % tc.checkpoint_interval == 0) or e == tc.epochs - 1:
                with self.logger.span("agg_gradients"):  # repurposed: ckpt IO
                    pass
                self.ckpt.save(e, self.state,
                               sampler_state=self.sampler.state_dict(),
                               host_rng_state=ckpt_lib.host_rng_state(self.swap_rng))
            self.logger.end_row()

            # one worker-CSV row per ROUND (reference worker.py:286 writes per
            # round); spans are chunk-level since rounds fuse on device.
            d_losses = np.asarray(chunk_metrics["mean_d_loss"])  # (clen, N)
            for r in range(self.n):
                wl = self._worker_logs[r]
                for t in range(d_losses.shape[0]):
                    round_no = e - d_losses.shape[0] + 1 + t
                    wl.begin_row(spans_lib.worker_row_template(
                        round_no, self._worker_row_template["size.model"]))
                    wl.mark(mean_d_loss=float(d_losses[t, r]),
                            swap_with=None if (swapped_with is None or round_no != e)
                            else int(swapped_with[r]) + 1)
                    wl.end_row()

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
            "final_mean_d_loss": float(np.mean(np.asarray(chunk_metrics["mean_d_loss"][-1])))
            if chunk_metrics is not None else None,
            "evals": self._eval_history,
        }
        log.info("done: %s", summary)
        return summary

    def close(self):
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
