"""The MD-GAN round as an explicit shard_map SPMD program.

BASELINE.json's north star describes the port as "the actor topology mapped to
a single `shard_map` over a TPU mesh — generator replicated, K discriminators
sharded, feedback aggregated via psum over ICI".  The engine's default path
(`engine/mdgan.py`) expresses the same program with stacked arrays + sharding
constraints and lets XLA's SPMD partitioner insert the collectives — usually
the better engineering choice (works at any worker:device ratio, composes
with vmap/scan, no manual collective bookkeeping).

This module is the explicit twin: one device per worker, communication
spelled out —

  * every device evaluates the same replicated generator forward (the
    reference's server broadcast of X_g/X_d becomes local slicing);
  * each device trains ITS discriminator on its private shard slice;
  * each device computes its error-feedback cotangent and the cross-worker
    aggregation is a literal ``lax.psum`` over the ``workers`` axis
    (reference ``server.py:266-304``);
  * every device applies the identical generator Adam step (replicated).

Tested equal to the engine path on the virtual 8-device mesh
(tests/test_parallel.py).  The discriminator-swap twin is
``parallel.swap.swap_ppermute``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mdgan_tpu.core import prng
from mdgan_tpu.engine import state as state_lib
from mdgan_tpu.engine.state import MDGANState, NetState
from mdgan_tpu.ops import losses


def make_shard_map_step(engine) -> Callable:
    """Build an explicit-SPMD single-round step for `engine`.

    Requires ``engine.mesh`` with exactly one worker per device on the worker
    axis (``mesh.shape[worker_axis] == engine.n``).
    """
    mesh = engine.mesh
    axis = engine.mesh_cfg.worker_axis
    if mesh is None or mesh.shape[axis] != engine.n:
        raise ValueError("shard_map step needs one worker per device on the "
                         f"{axis!r} mesh axis")
    cfg, n, k, b = engine.cfg, engine.n, engine.k, engine.cfg.batch_size
    h, w, c = engine.spec.shape
    zdim = engine.spec.z_dim

    def per_device(g_params, g_stats, g_opt, d_params, d_stats,
                   d_count, d_mu, d_nu, key, step_no, data, idx):
        import optax

        # worker-local slices arrive with a leading axis of 1; drop it
        squeeze = lambda t: jax.tree.map(lambda a: a[0], t)
        d_params, d_stats = squeeze(d_params), squeeze(d_stats)
        d_opt_l = (optax.ScaleByAdamState(count=d_count, mu=squeeze(d_mu),
                                          nu=squeeze(d_nu)),
                   optax.EmptyState())
        my = jax.lax.axis_index(axis)
        g_assign = my % k
        d_assign = (my + 1) % k

        kz = prng.for_step(key, prng.LATENT, step_no)
        kdrop = prng.for_step(key, prng.DROPOUT, step_no)

        # (1) replicated generator forward over all k*b latents, with VJP
        z = jax.random.normal(kz, (k * b, zdim), jnp.float32)

        def g_forward(params):
            return state_lib.apply_train(engine.g_model, params, g_stats, z)

        (x_all, g_stats_new), g_vjp = jax.vjp(g_forward, g_params)
        x_k = x_all.reshape(k, b, h, w, c)

        # (2) worker-local fake batches (the reference's recv from server)
        x_d = jax.lax.stop_gradient(
            jax.lax.dynamic_index_in_dim(x_k, d_assign, keepdims=False))
        real = losses.normalize_uint8(data[0][idx[0]])

        # (3) local discriminator training (worker.py:192-216)
        def d_loss_fn(params, stats, rng):
            r1, r2 = jax.random.split(rng)
            logits2, stats2 = state_lib.apply_train_pair(
                engine.d_model, params, stats,
                jnp.stack([real, x_d]), jnp.stack([r1, r2]))
            return losses.d_loss(logits2[0], logits2[1]), stats2

        def local_step(l, carry):
            params, stats, opt, loss_sum = carry
            rng = jax.random.fold_in(jax.random.fold_in(kdrop, l), my)
            (loss, stats), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(params, stats, rng)
            params, opt = state_lib.optimizer_step(
                engine.d_tx, None, grads, opt, params)
            return params, stats, opt, loss_sum + loss

        d_params, d_stats, d_opt_l, d_loss_sum = jax.lax.fori_loop(
            0, cfg.local_epochs, local_step,
            (d_params, d_stats, d_opt_l, jnp.float32(0)))

        # (4) error feedback w.r.t. X_g through the updated D (worker.py:218-233)
        x_g = jax.lax.stop_gradient(
            jax.lax.dynamic_index_in_dim(x_k, g_assign, keepdims=False))
        rng_fb = jax.random.fold_in(jax.random.fold_in(kdrop, cfg.local_epochs), my)

        def fb_loss(xg):
            logits, new_stats = state_lib.apply_train(engine.d_model, d_params,
                                                      d_stats, xg, rng_fb)
            return losses.g_loss(logits), new_stats

        (g_loss_val, d_stats), feedback = jax.value_and_grad(
            fb_loss, has_aux=True)(x_g)

        # (5) route my feedback onto my source batch and psum the cotangents
        # over the workers axis — THE explicit collective of the algorithm
        # (reference server.py:266-304, the N irecv + sum loop).
        cot_local = (
            jnp.zeros((k, b, h, w, c), x_all.dtype)
            .at[g_assign].add(feedback)
        )
        cot = jax.lax.psum(cot_local, axis) * (1.0 / (b * n))
        g_grad = g_vjp((cot.reshape(k * b, h, w, c),
                        jax.tree.map(jnp.zeros_like, g_stats_new)))[0]

        # (6) replicated generator Adam step
        g_params_new, g_opt_new = state_lib.optimizer_step(
            engine.g_tx, None, g_grad, g_opt, g_params)

        unsqueeze = lambda t: jax.tree.map(lambda a: a[None], t)
        adam_state = d_opt_l[0]
        return (g_params_new, g_stats_new, g_opt_new,
                unsqueeze(d_params), unsqueeze(d_stats),
                adam_state.count, unsqueeze(adam_state.mu),
                unsqueeze(adam_state.nu),
                d_loss_sum[None] / cfg.local_epochs, g_loss_val[None])

    rep = P()
    shard = P(axis)

    mapped = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, rep, shard, shard, rep, shard, shard,
                  rep, rep, shard, shard),
        out_specs=(rep, rep, rep, shard, shard, rep, shard, shard,
                   shard, shard),
        check_vma=False,
    )

    @jax.jit
    def step(st: MDGANState, data, idx, step_no):
        adam_state = st.d.opt[0]
        (g_params, g_stats, g_opt, d_params, d_stats,
         d_count, d_mu, d_nu, mean_d_loss, g_losses) = mapped(
            st.g.params, st.g.stats, st.g.opt,
            st.d.params, st.d.stats,
            adam_state.count, adam_state.mu, adam_state.nu,
            st.key, step_no, data, idx)
        import optax

        d_opt = (optax.ScaleByAdamState(count=d_count, mu=d_mu, nu=d_nu),
                 optax.EmptyState())
        new = MDGANState(
            g=NetState(params=g_params, stats=g_stats, opt=g_opt),
            d=NetState(params=d_params, stats=d_stats, opt=d_opt),
            key=st.key, step=st.step + 1)
        return new, {"mean_d_loss": mean_d_loss, "g_feedback_loss": g_losses}

    return step
