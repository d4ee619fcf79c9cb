"""Single-device DCGAN baseline trainer.

Rebuilds reference ``src/standalone_gan.py:180-273``: per round, one real
batch and one fake batch are drawn; then ``local_epochs`` inner iterations
each take a discriminator Adam step (real vs. detached fake) followed by a
generator Adam step.

Semantics notes (vs. the reference):
  * The fake batch used for D training is generated ONCE per round from the
    round-start generator and reused across inner iterations, exactly like the
    reference's ``fake_images`` tensor (``standalone_gan.py:190-191, 207``).
  * The generator step recomputes its forward at the *current* generator
    params.  For ``local_epochs == 1`` (every published reference run,
    ``shared-args.sh:8``) this is identical to the reference; for
    ``local_epochs > 1`` the reference would actually crash (double backward
    through a freed graph), so this is the only well-defined extension.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from mdgan_tpu.core import prng
from mdgan_tpu.core.config import TrainConfig
from mdgan_tpu.core.registry import DatasetSpec
from mdgan_tpu.engine import state as state_lib
from mdgan_tpu.engine.state import NetState, StandaloneState
from mdgan_tpu.ops import losses


class StandaloneEngine:
    def __init__(self, spec: DatasetSpec, train_cfg: TrainConfig):
        self.spec = spec
        self.cfg = train_cfg
        dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32
        self.g_model = spec.make_generator(dtype=dtype)
        self.d_model = spec.make_discriminator(dtype=dtype)
        self.g_tx = state_lib.make_optimizer(train_cfg.generator_opt)
        self.d_tx = state_lib.make_optimizer(train_cfg.discriminator_opt)
        fused_ok = train_cfg.use_pallas and train_cfg.fused_adam
        self.g_fused = (state_lib.make_fused_adam(train_cfg.generator_opt)
                        if fused_ok else None)
        self.d_fused = (state_lib.make_fused_adam(train_cfg.discriminator_opt)
                        if fused_ok else None)
        self._chunk_fns: Dict[int, Callable] = {}
        self._sample_fns: Dict[int, Callable] = {}

    def init_state(self, seed: int) -> StandaloneState:
        key = prng.root_key(seed)
        h, w, c = self.spec.shape
        b = self.cfg.batch_size
        z = jnp.zeros((b, self.spec.z_dim), jnp.float32)
        x = jnp.zeros((b, h, w, c), jnp.float32)
        g = state_lib.init_net(self.g_model, prng.lane(key, prng.INIT_G), z, self.g_tx)
        d = state_lib.init_net(self.d_model, prng.lane(key, prng.INIT_D), x, self.d_tx)
        # one-time chained-BN momentum guard for the fused pair-apply
        state_lib.verify_pair_momentum(self.d_model, d.params, d.stats, x,
                                       prng.lane(key, prng.INIT_D))
        return StandaloneState(g=g, d=d, key=key, step=jnp.int32(0))

    def _step(self, st: StandaloneState, data: jax.Array, idx: jax.Array, step_no: jax.Array):
        """One round. data: (num, H, W, C) uint8; idx: (b,) int32."""
        cfg = self.cfg
        b = cfg.batch_size
        kz = prng.for_step(st.key, prng.LATENT, step_no)
        kdrop = prng.for_step(st.key, prng.DROPOUT, step_no)

        real = losses.normalize_uint8(data[idx])
        z = jax.random.normal(kz, (b, self.spec.z_dim), jnp.float32)

        # fake batch fixed for the whole round (standalone_gan.py:190-191)
        fake0, _ = state_lib.apply_train(self.g_model, st.g.params, st.g.stats, z)
        fake0 = jax.lax.stop_gradient(fake0)

        def d_loss_fn(params, stats, rng):
            r1, r2 = jax.random.split(rng)
            logits2, stats2 = state_lib.apply_train_pair(
                self.d_model, params, stats,
                jnp.stack([real, fake0]), jnp.stack([r1, r2]))
            return losses.d_loss(logits2[0], logits2[1]), stats2

        def g_loss_fn(g_params, g_stats, d_params, d_stats, rng):
            fake, g_stats_new = state_lib.apply_train(self.g_model, g_params, g_stats, z)
            logits, d_stats_new = state_lib.apply_train(self.d_model, d_params,
                                                        d_stats, fake, rng)
            # reference standalone_gan.py:218 runs D(fake) in train mode during
            # the G step, updating D's BN running stats — keep that update
            return losses.g_loss(logits), (g_stats_new, d_stats_new)

        d_vg = jax.value_and_grad(d_loss_fn, has_aux=True)
        g_vg = jax.value_and_grad(g_loss_fn, has_aux=True)

        def inner(i, carry):
            g, d, dl_sum, gl_sum = carry
            rng_i = jax.random.fold_in(kdrop, i)
            rd, rg = jax.random.split(rng_i)
            # (1) D step (standalone_gan.py:199-213)
            (dl, d_stats_new), d_grads = d_vg(d.params, d.stats, rd)
            d_params_new, d_opt = state_lib.optimizer_step(
                self.d_tx, self.d_fused, d_grads, d.opt, d.params)
            d = NetState(params=d_params_new, stats=d_stats_new, opt=d_opt)
            # (2) G step against the updated D (standalone_gan.py:215-223)
            (gl, (g_stats_new, d_stats_new2)), g_grads = g_vg(
                g.params, g.stats, d.params, d.stats, rg)
            g_params_new, g_opt = state_lib.optimizer_step(
                self.g_tx, self.g_fused, g_grads, g.opt, g.params)
            g = NetState(params=g_params_new, stats=g_stats_new, opt=g_opt)
            d = NetState(params=d.params, stats=d_stats_new2, opt=d.opt)
            return g, d, dl_sum + dl, gl_sum + gl

        g, d, dl_sum, gl_sum = jax.lax.fori_loop(
            0, cfg.local_epochs, inner, (st.g, st.d, jnp.float32(0), jnp.float32(0))
        )
        new_state = StandaloneState(g=g, d=d, key=st.key, step=st.step + 1)
        metrics = {
            "mean_d_loss": dl_sum / cfg.local_epochs,
            "mean_g_loss": gl_sum / cfg.local_epochs,
        }
        # the round's fake batch (pre-G-update) — the tensor the reference
        # scores at eval rounds (``standalone_gan.py:190-191`` reused at 233+)
        return new_state, metrics, fake0

    def chunk_fn(self, num_steps: int) -> Callable:
        if num_steps not in self._chunk_fns:

            def run_chunk(st: StandaloneState, data: jax.Array, idx_chunk: jax.Array):
                steps = st.step + jnp.arange(num_steps, dtype=jnp.int32)

                def body(carry, xs):
                    st_c, _ = carry
                    idx, s = xs
                    new_st, metrics, fake0 = self._step(st_c, data, idx, s)
                    return (new_st, fake0.astype(jnp.float32)), metrics

                h, w, c = self.spec.shape
                x0 = jnp.zeros((self.cfg.batch_size, h, w, c), jnp.float32)
                unroll = self.cfg.scan_unroll
                if num_steps % max(unroll, 1) != 0:
                    unroll = 1
                (st_out, x_last), metrics = jax.lax.scan(
                    body, (st, x0), (idx_chunk, steps), unroll=max(unroll, 1))
                # reference-exact eval payload: the final round's fake batch
                metrics["x_eval"] = x_last
                return st_out, metrics

            self._chunk_fns[num_steps] = jax.jit(
                run_chunk, donate_argnums=(0,) if self.cfg.donate else ()
            )
        return self._chunk_fns[num_steps]

    def sample_fn(self, num: int) -> Callable:
        if num not in self._sample_fns:

            def sample(g: NetState, key: jax.Array) -> jax.Array:
                z = jax.random.normal(key, (num, self.spec.z_dim), jnp.float32)
                out, _ = state_lib.apply_train(self.g_model, g.params, g.stats, z)
                return out

            self._sample_fns[num] = jax.jit(sample)
        return self._sample_fns[num]
