"""MD-GAN engine correctness tests.

The key test proves the engine's explicit feedback->cotangent->VJP routing
(the TPU-native form of reference ``worker.py:218-236`` +
``server.py:266-313``) equals direct autodiff of the fused adversarial loss —
the chain-rule identity SURVEY.md §7 calls out as the hard part.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mdgan_tpu.core.config import TrainConfig, OptimizerConfig, k_batches
from mdgan_tpu.core import prng
from mdgan_tpu.core.registry import get as get_spec
from mdgan_tpu.data.builtin import synthesize
from mdgan_tpu.data.partitioner import shard_data
from mdgan_tpu.data.sampler import ShardSampler
from mdgan_tpu.engine import state as state_lib
from mdgan_tpu.engine.mdgan import MDGANEngine
from mdgan_tpu.ops import losses


def small_cfg(**kw):
    defaults = dict(
        batch_size=4, epochs=8, local_epochs=1, swap_interval=4, log_interval=100,
        chunk_size=2, compute_dtype="float32", donate=False, use_pallas=False,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def make_engine(n=4, dataset="SyntheticMNIST", **kw):
    spec = get_spec(dataset)
    cfg = small_cfg(**kw)
    eng = MDGANEngine(spec, cfg, num_workers=n)
    data, _ = spec.load("data", max_examples=64)
    shards, _ = shard_data(data, n, iid=True, seed=0)
    return eng, jnp.asarray(shards), cfg


def test_chunk_runs_and_losses_finite():
    eng, shards, cfg = make_engine(n=4)
    st = eng.init_state(seed=0)
    sampler = ShardSampler(4, shards.shape[1], cfg.batch_size, seed=0)
    idx = jnp.asarray(sampler.next_chunk(cfg.chunk_size))
    st2, metrics = eng.chunk_fn(cfg.chunk_size)(st, shards, idx)
    assert int(st2.step) == cfg.chunk_size
    assert metrics["mean_d_loss"].shape == (cfg.chunk_size, 4)
    assert np.all(np.isfinite(np.asarray(metrics["mean_d_loss"])))
    assert np.all(np.isfinite(np.asarray(metrics["g_feedback_loss"])))
    # params actually moved
    delta = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.sum(jnp.abs(l))),
        jax.tree.map(lambda a, b: a - b, st2.g.params, st.g.params), 0.0,
    )
    assert delta > 0


def test_chunk_bf16_moments_trains_and_stores_bf16():
    """``--moment_dtype bfloat16`` through the whole engine: Adam moments of
    BOTH nets live in bf16 across a chunk, params stay f32, losses finite,
    and the trajectory stays near the f32-moment run."""
    opt16 = OptimizerConfig(mu_dtype="bfloat16", nu_dtype="bfloat16")
    eng16, shards, cfg = make_engine(n=4, generator_opt=opt16,
                                     discriminator_opt=opt16)
    eng32, _, _ = make_engine(n=4)
    sampler = ShardSampler(4, shards.shape[1], cfg.batch_size, seed=0)
    idx = jnp.asarray(sampler.next_chunk(cfg.chunk_size))

    st16 = eng16.init_state(seed=0)
    for moment in (st16.g.opt[0].mu, st16.g.opt[0].nu, st16.d.opt[0].mu,
                   st16.d.opt[0].nu):
        assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(moment))
    st16, m16 = eng16.chunk_fn(cfg.chunk_size)(st16, shards, idx)
    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree.leaves(st16.g.opt[0].nu))
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(st16.g.params))
    assert np.all(np.isfinite(np.asarray(m16["mean_d_loss"])))

    st32 = eng32.init_state(seed=0)
    st32, m32 = eng32.chunk_fn(cfg.chunk_size)(st32, shards, idx)
    np.testing.assert_allclose(np.asarray(m16["mean_d_loss"]),
                               np.asarray(m32["mean_d_loss"]),
                               rtol=0.1, atol=0.05)


def test_chunk_x_eval_is_pre_update_round_output():
    """The chunk's ``x_eval`` must be the images generated DURING its final
    round by the PRE-update generator — reference eval semantics
    (``server.py:337`` scores ``X.detach()``, not a regeneration).  Pinned by
    replaying: state after L-1 rounds + one train-mode forward at round L-1's
    latents must reproduce ``x_eval`` of the L-round chunk exactly."""
    eng, shards, cfg = make_engine(n=4)
    sampler = ShardSampler(4, shards.shape[1], cfg.batch_size, seed=0)
    idx = jnp.asarray(sampler.next_chunk(3))

    st3, m3 = eng.chunk_fn(3)(eng.init_state(seed=0), shards, idx)
    assert m3["x_eval"].shape == (eng.k * cfg.batch_size, 28, 28, 1)

    # replay: the generator as it stood ENTERING round 2 (chunking invariance
    # holds, tested separately), then its round-2 forward
    st2, _ = eng.chunk_fn(2)(eng.init_state(seed=0), shards, idx[:2])
    kz = prng.for_step(st2.key, prng.LATENT, jnp.int32(2))
    z = jax.random.normal(kz, (eng.k * cfg.batch_size, eng.spec.z_dim),
                          jnp.float32)
    want, _ = state_lib.apply_train(eng.g_model, st2.g.params, st2.g.stats, z)
    np.testing.assert_allclose(np.asarray(m3["x_eval"]), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # and it is NOT the post-round generator's output (one Adam step apart)
    redo, _ = state_lib.apply_train(eng.g_model, st3.g.params, st3.g.stats, z)
    assert float(jnp.abs(redo - m3["x_eval"]).max()) > 1e-6


def test_standalone_chunk_x_eval_is_pre_update_round_output():
    """Standalone twin of the x_eval pin (``standalone_gan.py:190-191``: the
    round's fake batch is generated once, pre-G-update, and reused at eval)."""
    from mdgan_tpu.engine.standalone import StandaloneEngine

    spec = get_spec("SyntheticMNIST")
    cfg = small_cfg()
    eng = StandaloneEngine(spec, cfg)
    data, _ = spec.load("data", max_examples=64)
    arr = jnp.asarray(data)
    sampler = ShardSampler(1, len(data), cfg.batch_size, seed=0)
    idx = jnp.asarray(sampler.next_chunk(3)[:, 0, :])

    _, m3 = eng.chunk_fn(3)(eng.init_state(seed=0), arr, idx)
    st2, _ = eng.chunk_fn(2)(eng.init_state(seed=0), arr, idx[:2])
    kz = prng.for_step(st2.key, prng.LATENT, jnp.int32(2))
    z = jax.random.normal(kz, (cfg.batch_size, spec.z_dim), jnp.float32)
    want, _ = state_lib.apply_train(eng.g_model, st2.g.params, st2.g.stats, z)
    np.testing.assert_allclose(np.asarray(m3["x_eval"]), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_determinism_and_chunking_invariance():
    """Same seed => identical run; 4 steps as 1 chunk == 4 steps as 2+2.

    Guarantees the PRNG fold-by-global-step discipline (core/prng.py) makes
    results independent of scan chunking — required for resume correctness.
    """
    eng, shards, cfg = make_engine(n=2)

    def run(chunks):
        st = eng.init_state(seed=7)
        sampler = ShardSampler(2, shards.shape[1], cfg.batch_size, seed=0)
        for c in chunks:
            idx = jnp.asarray(sampler.next_chunk(c))
            st, _ = eng.chunk_fn(c)(st, shards, idx)
        return st

    a = run([4])
    b = run([2, 2])
    for la, lb in zip(jax.tree_util.tree_leaves(a.g.params),
                      jax.tree_util.tree_leaves(b.g.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=0, atol=0)


@pytest.mark.slow
def test_feedback_vjp_equals_direct_grad():
    """Engine G update == direct autodiff of
    (1/(b*N)) * sum_n mean_b BCE(D_n_updated(G(z_{n%k})), 1).

    Reimplements the round independently (fused-loss formulation, no explicit
    feedback tensors) and checks the resulting generator params match the
    engine's to float32 precision.
    """
    n = 4
    eng, shards, cfg = make_engine(n=n, dataset="SyntheticMNIST")
    b, k = cfg.batch_size, eng.k
    spec = eng.spec
    st = eng.init_state(seed=3)
    sampler = ShardSampler(n, shards.shape[1], b, seed=0)
    idx_chunk = sampler.next_chunk(1)
    idx = jnp.asarray(idx_chunk[0])

    # --- engine step ---
    st_eng, _ = eng.chunk_fn(1)(st, shards, jnp.asarray(idx_chunk))

    # --- independent reimplementation ---
    step_no = jnp.int32(0)
    kz = prng.for_step(st.key, prng.LATENT, step_no)
    kdrop = prng.for_step(st.key, prng.DROPOUT, step_no)
    z = jax.random.normal(kz, (k * b, spec.z_dim), jnp.float32)
    w_idx = jnp.arange(n)

    x_all, _ = state_lib.apply_train(eng.g_model, st.g.params, st.g.stats, z)
    x_k = x_all.reshape(k, b, *spec.shape)
    x_d = jax.lax.stop_gradient(x_k[(w_idx + 1) % k])
    real = losses.normalize_uint8(jax.vmap(lambda s, i: s[i])(shards, idx))

    def d_loss_fn(params, stats, real_n, fake_n, rng):
        r1, r2 = jax.random.split(rng)
        lr_, s1 = state_lib.apply_train(eng.d_model, params, stats, real_n, r1)
        lf_, s2 = state_lib.apply_train(eng.d_model, params, s1, fake_n, r2)
        return losses.d_loss(lr_, lf_), s2

    rng_l = jax.random.fold_in(kdrop, 0)
    rngs = jax.vmap(lambda ww: jax.random.fold_in(rng_l, ww))(w_idx)
    (dl, d_stats), d_grads = jax.vmap(
        jax.value_and_grad(d_loss_fn, has_aux=True), in_axes=(0, 0, 0, 0, 0)
    )(st.d.params, st.d.stats, real, x_d, rngs)
    d_updates, d_opt = eng.d_tx.update(d_grads, st.d.opt, st.d.params)
    d_params = optax.apply_updates(st.d.params, d_updates)

    rng_fb = jax.random.fold_in(kdrop, cfg.local_epochs)
    rngs_fb = jax.vmap(lambda ww: jax.random.fold_in(rng_fb, ww))(w_idx)

    def fused_g_loss(g_params):
        x_all2, _ = state_lib.apply_train(eng.g_model, g_params, st.g.stats, z)
        x_g = x_all2.reshape(k, b, *spec.shape)[w_idx % k]

        def per_worker(dp, ds, xg, rng):
            logits, _ = state_lib.apply_train(eng.d_model, dp, ds, xg, rng)
            return losses.g_loss(logits)

        per = jax.vmap(per_worker)(d_params, d_stats, x_g, rngs_fb)
        return jnp.sum(per) / (b * n)

    g_grad = jax.grad(fused_g_loss)(st.g.params)
    g_updates, _ = eng.g_tx.update(g_grad, st.g.opt, st.g.params)
    g_params_expected = optax.apply_updates(st.g.params, g_updates)

    for la, lb in zip(jax.tree_util.tree_leaves(st_eng.g.params),
                      jax.tree_util.tree_leaves(g_params_expected)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=5e-6)
    # D params must also agree
    for la, lb in zip(jax.tree_util.tree_leaves(st_eng.d.params),
                      jax.tree_util.tree_leaves(d_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=5e-6)


def test_swap_is_involutive_exchange():
    eng, shards, cfg = make_engine(n=4)
    st = eng.init_state(seed=0)
    rng = np.random.default_rng(0)
    perm = eng.sample_swap_perm(rng)
    assert sorted(perm) == [0, 1, 2, 3]
    assert np.all(perm[perm] == np.arange(4))  # involution
    assert np.all(perm != np.arange(4))        # full pairing, nobody idle

    st2 = eng.swap_fn()(st, jnp.asarray(perm))
    for la, lb in zip(jax.tree_util.tree_leaves(st2.d.params),
                      jax.tree_util.tree_leaves(st.d.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb)[perm])
    # Adam state does NOT travel (reference swaps only the state dict —
    # worker.py:253-283)
    for la, lb in zip(jax.tree_util.tree_leaves(st2.d.opt),
                      jax.tree_util.tree_leaves(st.d.opt)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_swap_requires_even_workers():
    eng, _, _ = make_engine(n=3, dataset="SyntheticMNIST")
    with pytest.raises(ValueError):
        eng.sample_swap_perm(np.random.default_rng(0))


def test_k_batches_formula():
    # k = max(floor(ln N), 2) — server.py:120
    assert k_batches(2) == 2
    assert k_batches(4) == 2
    assert k_batches(8) == 2
    assert k_batches(20) == 2
    assert k_batches(21) == 3
    assert k_batches(40) == 3


@pytest.mark.slow
def test_mesh_sharded_matches_single_device(eight_devices):
    """The same chunk on an 8-device mesh must reproduce single-device math."""
    from mdgan_tpu.core.config import MeshConfig
    from mdgan_tpu.core import mesh as mesh_lib

    n = 8
    spec = get_spec("SyntheticMNIST")
    cfg = small_cfg(batch_size=4, chunk_size=2)
    data, _ = spec.load("data", max_examples=128)
    shards_np, _ = shard_data(data, n, iid=True, seed=0)
    sampler = ShardSampler(n, shards_np.shape[1], cfg.batch_size, seed=0)
    idx = sampler.next_chunk(cfg.chunk_size)

    # single device
    eng1 = MDGANEngine(spec, cfg, num_workers=n)
    st1 = eng1.init_state(seed=5)
    out1, m1 = eng1.chunk_fn(cfg.chunk_size)(st1, jnp.asarray(shards_np), jnp.asarray(idx))

    # 8-device mesh
    mcfg = MeshConfig(num_workers=n, num_replicas=1)
    mesh = mesh_lib.make_mesh(mcfg)
    eng8 = MDGANEngine(spec, cfg, num_workers=n, mesh=mesh, mesh_cfg=mcfg)
    st8 = eng8.init_state(seed=5)
    shards8 = eng8.shard_data(shards_np)
    out8, m8 = eng8.chunk_fn(cfg.chunk_size)(st8, shards8, jnp.asarray(idx))

    for la, lb in zip(jax.tree_util.tree_leaves(out1.g.params),
                      jax.tree_util.tree_leaves(out8.g.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1["mean_d_loss"]),
                               np.asarray(m8["mean_d_loss"]), rtol=1e-5, atol=1e-6)
