"""The MD-GAN training round as a single SPMD program.

This module is the TPU-native inversion of the reference's entire actor
runtime (reference ``src/actors/server.py`` + ``src/actors/worker.py``): what
the reference implements as N+1 processes exchanging tensors over TCP is here
ONE jitted step over stacked arrays, sharded over a device mesh.

Per round (reference round structure, ``server.py:213-370`` / ``worker.py:157-286``):

 1. **Generate** — one generator forward over ``k*b`` latents,
    ``k = max(floor(ln N), 2)`` (``server.py:120, 219-224``), captured as a
    ``jax.vjp`` so the backward below reuses the linearization.
 2. **Distribute** — worker n reads fake batches ``X_g = K[n % k]`` and
    ``X_d = K[(n+1) % k]`` (``server.py:238-239``).  The reference's isend /
    irecv of the stacked ``[X_g, X_d]`` tensor (``server.py:229-246``) becomes
    an array gather; on a mesh XLA turns it into an ICI broadcast.
 3. **Local D training** — each worker takes ``local_epochs`` Adam steps of
    ``BCE(D(real), 1) + BCE(D(X_d), 0)`` on its private shard
    (``worker.py:192-216``), expressed as a vmapped grad over the stacked
    discriminator axis inside a ``lax.fori_loop``.
 4. **Error feedback** — each worker computes the gradient of
    ``BCE(D_updated(X_g), 1)`` w.r.t. the *images* ``X_g``
    (``worker.py:218-233``).  The reference ships these (b, C, H, W) tensors
    over TCP; here they are cotangents scatter-added onto their source batches
    and pushed through the generator VJP with the reference's exact
    ``1/(b*N)`` scaling (``server.py:266-313``) — the N sequential
    ``autograd.grad(retain_graph=True)`` calls collapse into one batched VJP,
    and the cross-worker sum becomes a mesh psum inserted by XLA.
 5. **Generator Adam step** (``server.py:306-313``).

The discriminator swap (``server.py:315-333`` + ``worker.py:239-284``) is a
separate tiny jitted function: a permutation gather on the stacked axis
(= collective permute on a mesh) replacing the reference's TensorDict state
dict P2P exchange.  Adam state intentionally stays put, as in the reference
(only ``state_dict`` — params + BN stats — travels).

Steps are fused ``chunk_size`` at a time with ``lax.scan`` so tiny-model rounds
are not host-dispatch-bound.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from mdgan_tpu.core import prng
from mdgan_tpu.core.config import MeshConfig, TrainConfig, k_batches
from mdgan_tpu.core.registry import DatasetSpec
from mdgan_tpu.engine import state as state_lib
from mdgan_tpu.engine.state import MDGANState, NetState
from mdgan_tpu.ops import losses


class MDGANEngine:
    """Builds and holds the jitted train-chunk / swap / sample programs."""

    def __init__(
        self,
        spec: DatasetSpec,
        train_cfg: TrainConfig,
        num_workers: int,
        mesh=None,
        mesh_cfg: Optional[MeshConfig] = None,
    ):
        if num_workers < 1:
            raise ValueError("need at least one discriminator worker")
        if not 0.0 <= train_cfg.straggler_rate < 1.0:
            raise ValueError(
                f"straggler_rate must be in [0, 1), got {train_cfg.straggler_rate}")
        self.spec = spec
        self.cfg = train_cfg
        self.n = num_workers
        self.k = k_batches(num_workers)
        self.mesh = mesh
        self.mesh_cfg = mesh_cfg
        dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32
        self.g_model = spec.make_generator(dtype=dtype)
        self.d_model = spec.make_discriminator(dtype=dtype)
        self.g_tx = state_lib.make_optimizer(train_cfg.generator_opt)
        self.d_tx = state_lib.make_optimizer(train_cfg.discriminator_opt)
        # Pallas fused Adam on single-device runs (a pallas_call is not
        # auto-partitioned under a sharded mesh; multi-chip keeps optax).
        fused_ok = train_cfg.use_pallas and train_cfg.fused_adam and (
            mesh is None or int(np.prod(list(mesh.shape.values()))) == 1)
        self.g_fused = state_lib.make_fused_adam(train_cfg.generator_opt) if fused_ok else None
        self.d_fused = state_lib.make_fused_adam(train_cfg.discriminator_opt) if fused_ok else None
        h, w, c = spec.shape
        single_dev = mesh is None or int(np.prod(list(mesh.shape.values()))) == 1
        # sharding-constraint helper: annotates batch-carrying intermediates so
        # XLA splits batch work over the replica axis (data parallelism) and
        # worker-stacked tensors over the workers axis. No-op off-mesh.
        if mesh is not None and mesh_cfg is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep_ax = mesh_cfg.replica_axis if mesh.shape.get(
                mesh_cfg.replica_axis, 1) > 1 else None
            wrk_ax = mesh_cfg.worker_axis

            def _constrain(x, kind):
                if kind == "worker_batch":      # (N, b, ...)
                    spec_ = P(wrk_ax, rep_ax)
                elif kind == "global_batch":    # (k*b, ...)
                    spec_ = P(rep_ax)
                else:
                    spec_ = P()
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec_))

            self._constrain = _constrain
        else:
            self._constrain = lambda x, kind: x
        # Workers-axis sharding strategy: explicit shard_map once the axis is
        # really sharded (XLA's partitioner chokes on the batch-grouped convs
        # the stacked-D vmap produces — see _d_region_shard_map), compiler
        # sharding constraints otherwise.
        self._workers_sharded = False
        if mesh is not None and mesh_cfg is not None:
            w_shards = mesh.shape.get(mesh_cfg.worker_axis, 1)
            if w_shards > 1:
                if num_workers % w_shards != 0:
                    raise ValueError(
                        f"num_workers={num_workers} must be divisible by the "
                        f"workers mesh axis size {w_shards}")
                self._workers_sharded = True
        # Pallas fused gather+normalize sampling (ops/sampling.py, opt-in):
        # rows must be 128-byte aligned; multi-device keeps the XLA gather.
        self._pallas_sampling = (train_cfg.use_pallas
                                 and train_cfg.pallas_sampling and single_dev
                                 and (h * w * c) % 128 == 0)
        self._chunk_fns: Dict[int, Callable] = {}
        self._swap_fn = None
        self._sample_fns: Dict[int, Callable] = {}

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------

    def init_state(self, seed: int) -> MDGANState:
        key = prng.root_key(seed)
        h, w, c = self.spec.shape
        b = self.cfg.batch_size
        z = jnp.zeros((b, self.spec.z_dim), jnp.float32)
        x = jnp.zeros((b, h, w, c), jnp.float32)
        g = state_lib.init_net(self.g_model, prng.lane(key, prng.INIT_G), z, self.g_tx)
        d = state_lib.init_stacked_net(
            self.d_model, prng.lane(key, prng.INIT_D), x, self.d_tx, self.n
        )
        # one-time chained-BN momentum guard for the fused pair-apply (the
        # D step's real+fake forward, worker.py:197-203 semantics)
        state_lib.verify_pair_momentum(
            self.d_model,
            jax.tree.map(lambda a: a[0], d.params),
            jax.tree.map(lambda a: a[0], d.stats),
            x, prng.lane(key, prng.INIT_D))
        st = MDGANState(g=g, d=d, key=key, step=jnp.int32(0))
        if self.mesh is not None:
            st = self.shard_state(st)
        return st

    def shard_state(self, st: MDGANState) -> MDGANState:
        from mdgan_tpu.core import mesh as mesh_lib

        wrk = mesh_lib.worker_sharding(self.mesh, self.mesh_cfg)
        rep = mesh_lib.replicated(self.mesh)
        d = jax.tree.map(
            lambda a: mesh_lib.global_put(a, wrk)
            if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[:1] == (self.n,)
            else mesh_lib.global_put(a, rep),
            st.d,
        )
        # generator: replicated without a tensor axis; tensor-parallel
        # (trailing-dim sharded params + Adam moments) with one
        g = mesh_lib.shard_generator(st.g, self.mesh, self.mesh_cfg)
        return MDGANState(g=g, d=d, key=mesh_lib.global_put(st.key, rep),
                          step=mesh_lib.global_put(st.step, rep))

    def shard_data(self, shards: np.ndarray) -> jax.Array:
        """Place the (N, S, H, W, C) uint8 shard stack on the mesh.

        With pallas sampling enabled, the stack is stored pre-tiled in the
        DMA-friendly (N, S, row//128, 128) view (one-time relayout)."""
        if self._pallas_sampling:
            from mdgan_tpu.ops.sampling import pretile_shards

            return pretile_shards(shards, self.spec.shape)
        if self.mesh is not None:
            from mdgan_tpu.core import mesh as mesh_lib

            return mesh_lib.global_put(
                np.asarray(shards),
                mesh_lib.worker_sharding(self.mesh, self.mesh_cfg))
        return jnp.asarray(shards)

    # ------------------------------------------------------------------
    # one training round
    # ------------------------------------------------------------------

    def _d_region(self, d_params, d_stats, d_opt, x_k, data, idx, kdrop,
                  w_ids, constrain, fb_mask=None):
        """Worker-local phases of the round (reference ``worker.py:157-286``):
        private-shard sampling, ``local_epochs`` D Adam steps, post-update
        error-feedback cotangents.

        ``fb_mask`` (straggler simulation, config ``straggler_rate``): a
        replicated (N,) bool vector of which workers' feedbacks the server
        accepted this round.  Dropped feedbacks are zeroed BEFORE the
        scatter-add — the discriminator update and the ``fb_sq`` payload
        metric are untouched, because the reference's proposed timeout
        (report ``discussion.tex:51-55``) discards late feedback at the
        *server* after the worker has already trained and sent it.

        Operates on whatever slice of the worker stack it is handed — the full
        stack single-device / compiler-sharded, or the device-local slice
        under :meth:`_d_region_shard_map`.  ``w_ids`` are the GLOBAL worker
        indices of the slice (they seed per-worker RNG and pick fake batches),
        so numerics are layout-independent.

        Returns (d_params, d_stats, d_opt, mean_d_loss, g_losses,
        cot, fb_sq) where ``cot`` is the (k, b, h, w, c) scatter-added
        UNSCALED cotangent sum over this slice's workers and ``fb_sq`` the sum
        of squared feedback entries (for the feedback_norm metric).
        """
        cfg, k, b = self.cfg, self.k, self.cfg.batch_size
        h, w, c = self.spec.shape
        nl = w_ids.shape[0]
        g_assign = w_ids % k          # X_g batch per worker (server.py:238)
        d_assign = (w_ids + 1) % k    # X_d batch per worker (server.py:239)

        # (2) distribute fake batches to workers (pure indexing).
        x_d = constrain(
            jax.lax.stop_gradient(jnp.take(x_k, d_assign, axis=0)),
            "worker_batch")  # (nl, b, h, w, c)

        if self._pallas_sampling:
            from mdgan_tpu.ops.sampling import sample_normalize

            # data arrives pre-tiled (shard_data); fused DMA gather + normalize
            real = sample_normalize(data, idx).reshape(nl, b, h, w, c)
        else:
            real = losses.normalize_uint8(
                jax.vmap(lambda shard, ii: shard[ii])(data, idx)
            )  # (nl, b, h, w, c) float32 in [-1, 1]
        real = constrain(real, "worker_batch")

        # (3) local discriminator training.  Real and fake forwards are fused
        # into one batched pass with exact per-half BN statistics
        # (state.apply_train_pair; semantics of worker.py:197-203).
        def d_loss_fn(params, stats, real_n, fake_n, rng):
            r1, r2 = jax.random.split(rng)
            logits2, stats2 = state_lib.apply_train_pair(
                self.d_model, params, stats,
                jnp.stack([real_n, fake_n]), jnp.stack([r1, r2]))
            return losses.d_loss(logits2[0], logits2[1]), stats2

        d_vg = jax.vmap(jax.value_and_grad(d_loss_fn, has_aux=True),
                        in_axes=(0, 0, 0, 0, 0))

        def local_step(l, carry):
            params, stats, opt, loss_sum = carry
            rng_l = jax.random.fold_in(kdrop, l)
            rngs = jax.vmap(lambda ww: jax.random.fold_in(rng_l, ww))(w_ids)
            (loss, new_stats), grads = d_vg(params, stats, real, x_d, rngs)
            params, opt = state_lib.optimizer_step(
                self.d_tx, self.d_fused, grads, opt, params)
            return params, new_stats, opt, loss_sum + loss

        d_params, d_stats, d_opt, d_loss_sum = jax.lax.fori_loop(
            0, cfg.local_epochs, local_step,
            (d_params, d_stats, d_opt, jnp.zeros(nl, jnp.float32)),
        )
        mean_d_loss = d_loss_sum / cfg.local_epochs  # (nl,) — worker.py:215

        # (4) error feedback through the UPDATED discriminators (worker.py:218-233).
        x_g = constrain(jnp.take(x_k, g_assign, axis=0), "worker_batch")
        # (nl, b, h, w, c) — same images the G VJP linearized

        def fb_loss(xg_n, params, stats, rng):
            logits, new_stats = state_lib.apply_train(self.d_model, params, stats,
                                                      xg_n, rng)
            return losses.g_loss(logits), new_stats

        rng_fb = jax.random.fold_in(kdrop, cfg.local_epochs)
        rngs_fb = jax.vmap(lambda ww: jax.random.fold_in(rng_fb, ww))(w_ids)
        fb_and_loss = jax.vmap(jax.value_and_grad(fb_loss, has_aux=True),
                               in_axes=(0, 0, 0, 0))
        (g_losses, d_stats), feedback = fb_and_loss(
            jax.lax.stop_gradient(x_g), d_params, d_stats, rngs_fb
        )  # feedback: (nl, b, h, w, c) = the reference's worker->server payload
        # the train-mode D(X_g) forward updates BN running stats too
        # (reference worker.py:220-221) — those are the stats that travel in
        # swaps and final exports, so keep them.

        # (5a) route feedbacks onto their source batches (server.py:266-302);
        # the cross-slice sum/scaling happens in the caller.
        fb_sq = jnp.sum(feedback.astype(jnp.float32) ** 2)
        if fb_mask is not None:
            # server-side straggler discard: late feedbacks contribute zero
            feedback = feedback * fb_mask[w_ids].astype(feedback.dtype)[
                :, None, None, None, None]
        cot = (
            jnp.zeros((k, b, h, w, c), x_k.dtype)
            .at[g_assign]
            .add(feedback)
        )
        return d_params, d_stats, d_opt, mean_d_loss, g_losses, cot, fb_sq

    def _d_region_shard_map(self, d_params, d_stats, d_opt, x_k, data, idx,
                            kdrop, fb_mask=None):
        """The D region as an explicit shard_map over the workers mesh axis.

        XLA's SPMD partitioner cannot split the batch-grouped convolutions
        that vmapping the stacked discriminators produces once the workers
        axis has as many shards as the kernel's per-group output features
        (e.g. DCGAN's final 1-channel conv or a to-RGB conv on an 8-way
        axis: "output feature dimension (3) must be divisible by
        feature_group_count (8)").  Inside a manual-over-workers region each
        device holds its own worker slice, the vmap width is N/W, and the
        convolutions never cross devices — the partitioner problem
        disappears by construction.  The replica axis (if any) stays "auto":
        batch-dim constraints inside the region still apply to it.

        The feedback aggregation becomes a literal ``lax.psum`` over ICI —
        the explicit form of the reference's N-irecv + sum loop
        (``server.py:266-304``).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.mesh_cfg.worker_axis
        n_shards = self.mesh.shape[axis]
        nl = self.n // n_shards
        rep_ax = (self.mesh_cfg.replica_axis
                  if self.mesh.shape.get(self.mesh_cfg.replica_axis, 1) > 1
                  else None)

        def constrain_local(xv, kind):
            # worker dim is device-local here; only the (auto) replica axis
            # can still be annotated.
            if rep_ax is None:
                return xv
            if kind == "worker_batch":        # (nl, b, ...)
                spec_ = P(None, rep_ax)
            elif kind == "global_batch":      # (k*b, ...)
                spec_ = P(rep_ax)
            else:
                spec_ = P()
            return jax.lax.with_sharding_constraint(
                xv, NamedSharding(self.mesh, spec_))

        def worker_stacked_spec(tree):
            # params/stats/Adam moments carry a leading worker axis; scalar
            # leaves (Adam count) are replicated.
            return jax.tree.map(
                lambda l: P(axis) if (hasattr(l, "ndim") and l.ndim >= 1
                                      and l.shape[0] == self.n) else P(),
                tree)

        specs_d = (worker_stacked_spec(d_params), worker_stacked_spec(d_stats),
                   worker_stacked_spec(d_opt))

        def body(d_params, d_stats, d_opt, x_k, data, idx, kdrop, *mask_arg):
            shard_i = jax.lax.axis_index(axis)
            w_ids = shard_i * nl + jnp.arange(nl)
            (d_params, d_stats, d_opt, mean_d_loss, g_losses, cot,
             fb_sq) = self._d_region(d_params, d_stats, d_opt, x_k, data, idx,
                                     kdrop, w_ids, constrain_local,
                                     fb_mask=mask_arg[0] if mask_arg else None)
            # THE collective of the algorithm: feedback cotangents summed
            # across workers over ICI.
            cot = jax.lax.psum(cot, axis)
            fb_sq = jax.lax.psum(fb_sq, axis)
            return d_params, d_stats, d_opt, mean_d_loss, g_losses, cot, fb_sq

        # the straggler mask (if any) is replicated: every shard sees the
        # full (N,) accept vector and slices its own workers by w_ids
        extra = (P(),) if fb_mask is not None else ()
        mapped = jax.shard_map(
            body, mesh=self.mesh, axis_names={axis},
            in_specs=(*specs_d, P(), P(axis), P(axis), P(), *extra),
            out_specs=(*specs_d, P(axis), P(axis), P(), P()),
            check_vma=False,
        )
        args = (d_params, d_stats, d_opt, x_k, data, idx, kdrop)
        if fb_mask is not None:
            args += (fb_mask,)
        return mapped(*args)

    def _step(self, st: MDGANState, data: jax.Array, idx: jax.Array, step_no: jax.Array):
        """One MD-GAN round on stacked arrays.

        data: (N, S, H, W, C) uint8 — private real shards
        idx:  (N, b) int32         — this round's per-worker sample indices
        """
        cfg, n, k, b = self.cfg, self.n, self.k, self.cfg.batch_size
        h, w, c = self.spec.shape

        kz = prng.for_step(st.key, prng.LATENT, step_no)
        kdrop = prng.for_step(st.key, prng.DROPOUT, step_no)

        # Straggler simulation (cfg.straggler_rate, reference proposal
        # ``discussion.tex:51-55``): draw each worker's feedback "arrival
        # time" u ~ U(0,1); it beats the server's timeout iff u <= 1 - rate,
        # and the earliest arrival always survives (the proposal proceeds
        # once at least one feedback is in).  Static-off: rate == 0.0 leaves
        # the parity program untouched.
        fb_mask = None
        if cfg.straggler_rate > 0.0:
            u = jax.random.uniform(
                prng.for_step(st.key, prng.STRAGGLER, step_no), (n,))
            fb_mask = (u <= 1.0 - cfg.straggler_rate) | (u == jnp.min(u))

        # (1) generate k*b fakes in ONE forward, capturing the VJP.
        z = jax.random.normal(kz, (k * b, self.spec.z_dim), jnp.float32)

        def g_forward(params):
            out, new_stats = state_lib.apply_train(self.g_model, params, st.g.stats, z)
            return out, new_stats

        def g_forward_sharded(params):
            out, new_stats = g_forward(params)
            return self._constrain(out, "global_batch"), new_stats

        (x_all, g_stats_new), g_vjp = jax.vjp(g_forward_sharded, st.g.params,
                                              has_aux=False)
        # NB: has_aux path differs across jax versions; returning a tuple primal
        # and taking its VJP with a zero cotangent on stats is equivalent —
        # see _zero_like_stats below.
        x_k = x_all.reshape(k, b, h, w, c)

        # (2)-(4): the worker-local region — explicit shard_map once the
        # workers axis is actually sharded (see _d_region_shard_map), the
        # plain stacked form otherwise.
        if self._workers_sharded:
            (d_params, d_stats, d_opt, mean_d_loss, g_losses, cot,
             fb_sq) = self._d_region_shard_map(
                st.d.params, st.d.stats, st.d.opt, x_k, data, idx, kdrop,
                fb_mask=fb_mask)
        else:
            (d_params, d_stats, d_opt, mean_d_loss, g_losses, cot,
             fb_sq) = self._d_region(
                st.d.params, st.d.stats, st.d.opt, x_k, data, idx, kdrop,
                jnp.arange(n), self._constrain, fb_mask=fb_mask)

        # (5) run the generator VJP once over the summed cotangents with the
        # reference's exact 1/(b*N) scaling (server.py:266-313).  Under the
        # straggler policy the mean runs over the surviving feedbacks only,
        # 1/(b*|S|) — the denominator the reference's fixed 1/(b*N) would
        # become once late feedbacks are discarded rather than counted as
        # zero gradient (|S| >= 1 by construction).
        if fb_mask is None:
            cot = cot.reshape(k * b, h, w, c) * (1.0 / (b * n))
        else:
            n_fb = jnp.sum(fb_mask.astype(jnp.float32))
            cot = (cot.reshape(k * b, h, w, c).astype(jnp.float32)
                   * (1.0 / (b * n_fb))).astype(x_all.dtype)
        g_grad = g_vjp((cot, self._zero_like_stats(g_stats_new)))[0]

        g_params, g_opt = state_lib.optimizer_step(
            self.g_tx, self.g_fused, g_grad, st.g.opt, st.g.params)

        new_state = MDGANState(
            g=NetState(params=g_params, stats=g_stats_new, opt=g_opt),
            d=NetState(params=d_params, stats=d_stats, opt=d_opt),
            key=st.key,
            step=st.step + 1,
        )
        metrics = {
            "mean_d_loss": mean_d_loss,               # (N,)
            "g_feedback_loss": g_losses,              # (N,) BCE(D_n(X_g),1)
            "feedback_norm": jnp.sqrt(fb_sq),
        }
        if fb_mask is not None:
            # how many feedbacks the server accepted this round (|S| in the
            # reference's proposed timeout policy)
            metrics["n_feedbacks"] = jnp.sum(fb_mask.astype(jnp.int32))
        # x_all: the k*b images generated DURING this round (pre-update
        # generator) — the exact tensor the reference scores at eval rounds
        # (``server.py:337`` reuses ``X.detach()``, not a regeneration).
        return new_state, metrics, x_all

    @staticmethod
    def _zero_like_stats(stats):
        return jax.tree.map(jnp.zeros_like, stats)

    # ------------------------------------------------------------------
    # fused multi-step chunk
    # ------------------------------------------------------------------

    def chunk_fn(self, num_steps: int) -> Callable:
        """Jitted scan of `num_steps` rounds. Cached per chunk length."""
        if num_steps not in self._chunk_fns:

            def run_chunk(st: MDGANState, data: jax.Array, idx_chunk: jax.Array):
                steps = st.step + jnp.arange(num_steps, dtype=jnp.int32)

                def body(carry, xs):
                    st_c, _ = carry
                    idx, s = xs
                    new_st, metrics, x_all = self._step(st_c, data, idx, s)
                    # carry (not stack) the round's images: O(1) memory, and
                    # the chunk's LAST round is always the eval round (the
                    # host loop clips chunks at eval boundaries)
                    return (new_st, x_all.astype(jnp.float32)), metrics

                h, w, c = self.spec.shape
                x0 = jnp.zeros((self.k * self.cfg.batch_size, h, w, c),
                               jnp.float32)
                unroll = self.cfg.scan_unroll
                if num_steps % max(unroll, 1) != 0:
                    unroll = 1
                (st_out, x_last), metrics = jax.lax.scan(
                    body, (st, x0), (idx_chunk, steps), unroll=max(unroll, 1))
                # reference-exact eval payload (server.py:337): the final
                # round's generated batch, pre-update by construction
                metrics["x_eval"] = x_last
                return st_out, metrics

            self._chunk_fns[num_steps] = jax.jit(
                run_chunk, donate_argnums=(0,) if self.cfg.donate else ()
            )
        return self._chunk_fns[num_steps]

    # ------------------------------------------------------------------
    # discriminator swap
    # ------------------------------------------------------------------

    def sample_swap_perm(self, rng: np.random.Generator) -> np.ndarray:
        """Random non-overlapping pairs -> involutive permutation
        (server.py:321-332). Requires even N (the reference enforces odd
        world_size, i.e. even N, at ``bootstrap.py:163-164``)."""
        if self.n % 2 != 0:
            raise ValueError("discriminator swap requires an even worker count")
        pairs = rng.permutation(self.n).reshape(-1, 2)
        perm = np.arange(self.n)
        perm[pairs[:, 0]] = pairs[:, 1]
        perm[pairs[:, 1]] = pairs[:, 0]
        return perm.astype(np.int32)

    def swap(self, st: MDGANState, perm: np.ndarray) -> MDGANState:
        """Swap dispatch honoring cfg.swap_impl (gather | ppermute | auto)."""
        impl = self.cfg.swap_impl
        eligible = (
            self.mesh is not None
            and self.mesh_cfg is not None
            and self.mesh.shape[self.mesh_cfg.worker_axis] == self.n
        )
        if impl == "ppermute" and not eligible:
            raise ValueError(
                "swap_impl='ppermute' needs a mesh with one worker per device "
                f"on the worker axis (mesh={self.mesh}, workers={self.n}); "
                "use 'gather' or 'auto'")
        if impl == "ppermute" or (impl == "auto" and eligible):
            from mdgan_tpu.parallel.swap import swap_ppermute

            axis = self.mesh_cfg.worker_axis
            d = NetState(
                params=swap_ppermute(st.d.params, perm, self.mesh, axis),
                stats=swap_ppermute(st.d.stats, perm, self.mesh, axis)
                if jax.tree.leaves(st.d.stats) else st.d.stats,
                opt=swap_ppermute(st.d.opt, perm, self.mesh, axis)
                if self.cfg.swap_opt_state else st.d.opt,
            )
            return MDGANState(g=st.g, d=d, key=st.key, step=st.step)
        return self.swap_fn()(st, jnp.asarray(perm))

    def swap_fn(self) -> Callable:
        if self._swap_fn is None:

            def swap(st: MDGANState, perm: jax.Array) -> MDGANState:
                take = lambda a: jnp.take(a, perm, axis=0)
                d = NetState(
                    params=jax.tree.map(take, st.d.params),
                    stats=jax.tree.map(take, st.d.stats),
                    opt=jax.tree.map(
                        lambda a: take(a)
                        if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[:1] == (self.n,)
                        else a,
                        st.d.opt,
                    )
                    if self.cfg.swap_opt_state
                    else st.d.opt,
                )
                return MDGANState(g=st.g, d=d, key=st.key, step=st.step)

            self._swap_fn = jax.jit(swap, donate_argnums=(0,) if self.cfg.donate else ())
        return self._swap_fn

    # ------------------------------------------------------------------
    # sampling / inference (the reference's gen_images path)
    # ------------------------------------------------------------------

    def sample_fn(self, num: int) -> Callable:
        """Generate `num` images in train-mode BN (the reference's generator
        always runs in .train(), including for grids/eval — server.py:219,
        336-352)."""
        if num not in self._sample_fns:

            def sample(g: NetState, key: jax.Array) -> jax.Array:
                z = jax.random.normal(key, (num, self.spec.z_dim), jnp.float32)
                out, _ = state_lib.apply_train(self.g_model, g.params, g.stats, z)
                return out

            self._sample_fns[num] = jax.jit(sample)
        return self._sample_fns[num]
