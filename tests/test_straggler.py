"""Straggler-tolerance simulation (config ``straggler_rate``).

The reference *proposes* a server-side feedback timeout — proceed with the
worker feedbacks that arrived in time, discard the late ones — but never
implements it (reference ``report/sections/discussion.tex:51-55``).
mdgan_tpu builds that policy as a seeded simulation: per round each worker's
feedback is dropped with probability ``straggler_rate``, the generator step
averages the survivors (1/(b*|S|)), the earliest arrival always survives,
and discriminator training is untouched (the reference drop happens at the
server AFTER the worker trained and sent its payload).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdgan_tpu.core import prng
from mdgan_tpu.core.config import TrainConfig
from mdgan_tpu.core.registry import get as get_spec
from mdgan_tpu.data.partitioner import shard_data
from mdgan_tpu.data.sampler import ShardSampler
from mdgan_tpu.engine.mdgan import MDGANEngine


def small_cfg(**kw):
    defaults = dict(
        batch_size=4, epochs=8, local_epochs=1, swap_interval=4,
        log_interval=100, chunk_size=2, compute_dtype="float32",
        donate=False, use_pallas=False,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def run_one_chunk(n, rate, steps=1, seed=3, **kw):
    spec = get_spec("SyntheticMNIST")
    cfg = small_cfg(straggler_rate=rate, chunk_size=steps, **kw)
    eng = MDGANEngine(spec, cfg, num_workers=n)
    data, _ = spec.load("data", max_examples=64)
    shards, _ = shard_data(data, n, iid=True, seed=0)
    sampler = ShardSampler(n, shards.shape[1], cfg.batch_size, seed=0)
    idx = jnp.asarray(sampler.next_chunk(steps))
    st, m = eng.chunk_fn(steps)(eng.init_state(seed=seed), jnp.asarray(shards), idx)
    return st, m


def test_rate_validation():
    spec = get_spec("SyntheticMNIST")
    with pytest.raises(ValueError, match="straggler_rate"):
        MDGANEngine(spec, small_cfg(straggler_rate=1.0), num_workers=2)
    with pytest.raises(ValueError, match="straggler_rate"):
        MDGANEngine(spec, small_cfg(straggler_rate=-0.1), num_workers=2)


@pytest.mark.slow
def test_metric_absent_when_disabled():
    _, m = run_one_chunk(n=2, rate=0.0)
    assert "n_feedbacks" not in m


def test_drop_is_server_side_only():
    """Dropping feedback must leave every worker-side quantity bit-identical
    (the worker trained and sent before the server's timeout fired) and only
    change the generator update."""
    st0, m0 = run_one_chunk(n=4, rate=0.0)
    st1, m1 = run_one_chunk(n=4, rate=0.7)

    # worker-side: D params/stats, D losses, feedback payload norm untouched
    for la, lb in zip(jax.tree_util.tree_leaves(st0.d.params),
                      jax.tree_util.tree_leaves(st1.d.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(m0["mean_d_loss"]),
                                  np.asarray(m1["mean_d_loss"]))
    np.testing.assert_array_equal(np.asarray(m0["g_feedback_loss"]),
                                  np.asarray(m1["g_feedback_loss"]))
    # the payload norm is a cross-worker reduction: the two programs fuse it
    # differently, so compare to reduction-order tolerance, not bitwise
    np.testing.assert_allclose(np.asarray(m0["feedback_norm"]),
                               np.asarray(m1["feedback_norm"]),
                               rtol=1e-5, atol=0)

    # server-side: with 3-of-4 expected drops the accepted set is almost
    # surely a strict subset, so the G step must differ
    nf = np.asarray(m1["n_feedbacks"])
    assert nf.shape == (1,) and 1 <= nf[0] <= 4
    assert nf[0] < 4  # at rate 0.7/n=4 a full house would be a stream bug
    deltas = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
              for a, b in zip(jax.tree_util.tree_leaves(st0.g.params),
                              jax.tree_util.tree_leaves(st1.g.params))]
    assert max(deltas) > 0


@pytest.mark.slow
def test_survivor_guarantee_and_determinism():
    """|S| >= 1 every round even at a 90% drop rate, and the seeded
    simulation reproduces bit-for-bit."""
    st_a, m_a = run_one_chunk(n=8, rate=0.9, steps=16)
    st_b, m_b = run_one_chunk(n=8, rate=0.9, steps=16)
    nf = np.asarray(m_a["n_feedbacks"])
    assert nf.shape == (16,)
    assert np.all(nf >= 1) and np.all(nf <= 8)
    assert nf.min() == 1  # at rate 0.9 the floor should actually be hit
    np.testing.assert_array_equal(nf, np.asarray(m_b["n_feedbacks"]))
    for la, lb in zip(jax.tree_util.tree_leaves(st_a.g.params),
                      jax.tree_util.tree_leaves(st_b.g.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_mask_matches_documented_prng_stream():
    """The accept mask derives from the STRAGGLER lane folded by GLOBAL step
    (resume/chunking invariance contract, core/prng.py) — recompute it here
    from the documented derivation and match the engine's count."""
    n, rate, steps, seed = 8, 0.6, 5, 11
    _, m = run_one_chunk(n=n, rate=rate, steps=steps, seed=seed)
    key = prng.root_key(seed)
    want = []
    for s in range(steps):
        u = jax.random.uniform(
            prng.for_step(key, prng.STRAGGLER, jnp.int32(s)), (n,))
        mask = (u <= 1.0 - rate) | (u == jnp.min(u))
        want.append(int(jnp.sum(mask)))
    np.testing.assert_array_equal(np.asarray(m["n_feedbacks"]), np.asarray(want))


@pytest.mark.slow
def test_chunking_invariance_with_straggler():
    """4 rounds as one chunk == 2+2: the mask folds the global step, so the
    simulated drop pattern is independent of scan chunking (resume safety)."""
    spec = get_spec("SyntheticMNIST")
    cfg = small_cfg(straggler_rate=0.5)
    eng = MDGANEngine(spec, cfg, num_workers=2)
    data, _ = spec.load("data", max_examples=64)
    shards, _ = shard_data(data, 2, iid=True, seed=0)
    shards = jnp.asarray(shards)

    def run(chunks):
        st = eng.init_state(seed=7)
        sampler = ShardSampler(2, shards.shape[1], cfg.batch_size, seed=0)
        nfs = []
        for c in chunks:
            idx = jnp.asarray(sampler.next_chunk(c))
            st, m = eng.chunk_fn(c)(st, shards, idx)
            nfs.append(np.asarray(m["n_feedbacks"]))
        return st, np.concatenate(nfs)

    st_a, nf_a = run([4])
    st_b, nf_b = run([2, 2])
    np.testing.assert_array_equal(nf_a, nf_b)
    for la, lb in zip(jax.tree_util.tree_leaves(st_a.g.params),
                      jax.tree_util.tree_leaves(st_b.g.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_single_worker_always_survives():
    """n=1: the earliest-arrival guarantee keeps the lone feedback every
    round, and 1/(b*|S|) == 1/(b*N) — the run must match the parity path."""
    st0, m0 = run_one_chunk(n=1, rate=0.0, steps=3)
    st1, m1 = run_one_chunk(n=1, rate=0.9, steps=3)
    np.testing.assert_array_equal(np.asarray(m1["n_feedbacks"]),
                                  np.ones(3, np.int32))
    for la, lb in zip(jax.tree_util.tree_leaves(st0.g.params),
                      jax.tree_util.tree_leaves(st1.g.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_mesh_sharded_matches_single_device_with_straggler(eight_devices):
    """The shard_map path (replicated mask, masked psum) must reproduce the
    stacked single-device math under the same drop pattern."""
    from mdgan_tpu.core.config import MeshConfig
    from mdgan_tpu.core import mesh as mesh_lib

    n = 8
    spec = get_spec("SyntheticMNIST")
    cfg = small_cfg(batch_size=4, chunk_size=2, straggler_rate=0.5)
    data, _ = spec.load("data", max_examples=128)
    shards_np, _ = shard_data(data, n, iid=True, seed=0)
    sampler = ShardSampler(n, shards_np.shape[1], cfg.batch_size, seed=0)
    idx = sampler.next_chunk(cfg.chunk_size)

    eng1 = MDGANEngine(spec, cfg, num_workers=n)
    out1, m1 = eng1.chunk_fn(cfg.chunk_size)(
        eng1.init_state(seed=5), jnp.asarray(shards_np), jnp.asarray(idx))

    mcfg = MeshConfig(num_workers=n, num_replicas=1)
    mesh = mesh_lib.make_mesh(mcfg)
    eng8 = MDGANEngine(spec, cfg, num_workers=n, mesh=mesh, mesh_cfg=mcfg)
    shards8 = eng8.shard_data(shards_np)
    out8, m8 = eng8.chunk_fn(cfg.chunk_size)(
        eng8.init_state(seed=5), shards8, jnp.asarray(idx))

    np.testing.assert_array_equal(np.asarray(m1["n_feedbacks"]),
                                  np.asarray(m8["n_feedbacks"]))
    for la, lb in zip(jax.tree_util.tree_leaves(out1.g.params),
                      jax.tree_util.tree_leaves(out8.g.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1["mean_d_loss"]),
                               np.asarray(m8["mean_d_loss"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_masked_vjp_equals_direct_grad():
    """Straggler twin of the chain-rule identity the design rests on
    (``test_feedback_vjp_equals_direct_grad``): the engine's G update under
    an accept mask S must equal direct autodiff of

        (1/(b*|S|)) * sum_{n in S} mean_b BCE(D_n_updated(G(z)[n%k]), 1)

    — an independent fused-loss formulation with no feedback tensors, no
    scatter-add, and no masking of cotangents."""
    import optax

    from mdgan_tpu.engine import state as state_lib
    from mdgan_tpu.ops import losses

    n, rate = 4, 0.6
    # pick the first seed whose round-0 mask actually drops someone (the
    # mask is a pure PRNG function, so this probe costs nothing)
    for seed in range(20):
        u0 = jax.random.uniform(
            prng.for_step(prng.root_key(seed), prng.STRAGGLER, jnp.int32(0)),
            (n,))
        m0 = (u0 <= 1.0 - rate) | (u0 == jnp.min(u0))
        if 1 <= int(jnp.sum(m0)) < n:
            break
    spec = get_spec("SyntheticMNIST")
    cfg = small_cfg(straggler_rate=rate, chunk_size=1)
    eng = MDGANEngine(spec, cfg, num_workers=n)
    data, _ = spec.load("data", max_examples=64)
    shards_np, _ = shard_data(data, n, iid=True, seed=0)
    shards = jnp.asarray(shards_np)
    b, k = cfg.batch_size, eng.k
    st = eng.init_state(seed=seed)
    sampler = ShardSampler(n, shards.shape[1], b, seed=0)
    idx_chunk = sampler.next_chunk(1)
    idx = jnp.asarray(idx_chunk[0])

    # --- engine step under the mask ---
    st_eng, m_eng = eng.chunk_fn(1)(st, shards, jnp.asarray(idx_chunk))

    # --- the mask, from the documented derivation ---
    step_no = jnp.int32(0)
    u = jax.random.uniform(
        prng.for_step(st.key, prng.STRAGGLER, step_no), (n,))
    mask = (u <= 1.0 - rate) | (u == jnp.min(u))
    n_s = int(jnp.sum(mask))
    assert 1 <= n_s < n, "pick a seed where at least one drop occurs"
    assert n_s == int(np.asarray(m_eng["n_feedbacks"])[0])

    # --- independent reimplementation ---
    kz = prng.for_step(st.key, prng.LATENT, step_no)
    kdrop = prng.for_step(st.key, prng.DROPOUT, step_no)
    z = jax.random.normal(kz, (k * b, spec.z_dim), jnp.float32)
    w_idx = jnp.arange(n)

    x_all, _ = state_lib.apply_train(eng.g_model, st.g.params, st.g.stats, z)
    x_d = jax.lax.stop_gradient(
        x_all.reshape(k, b, *spec.shape)[(w_idx + 1) % k])
    real = losses.normalize_uint8(jax.vmap(lambda s, i: s[i])(shards, idx))

    def d_loss_fn(params, stats, real_n, fake_n, rng):
        r1, r2 = jax.random.split(rng)
        lr_, s1 = state_lib.apply_train(eng.d_model, params, stats, real_n, r1)
        lf_, s2 = state_lib.apply_train(eng.d_model, params, s1, fake_n, r2)
        return losses.d_loss(lr_, lf_), s2

    rng_l = jax.random.fold_in(kdrop, 0)
    rngs = jax.vmap(lambda ww: jax.random.fold_in(rng_l, ww))(w_idx)
    (_, d_stats), d_grads = jax.vmap(
        jax.value_and_grad(d_loss_fn, has_aux=True), in_axes=(0, 0, 0, 0, 0)
    )(st.d.params, st.d.stats, real, x_d, rngs)
    d_updates, _ = eng.d_tx.update(d_grads, st.d.opt, st.d.params)
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
        return jnp.sum(jnp.where(mask, per, 0.0)) / (b * n_s)

    g_grad = jax.grad(fused_g_loss)(st.g.params)
    g_updates, _ = eng.g_tx.update(g_grad, st.g.opt, st.g.params)
    g_params_expected = optax.apply_updates(st.g.params, g_updates)

    for la, lb in zip(jax.tree_util.tree_leaves(st_eng.g.params),
                      jax.tree_util.tree_leaves(g_params_expected)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=5e-6)


@pytest.mark.slow
def test_trainer_resume_preserves_drop_pattern(tmp_path):
    """Checkpoint/resume under --straggler_rate: the mask folds the GLOBAL
    step, so a resumed run must replay the same drop pattern and land on
    bit-identical generator params, and the per-round n_feedbacks rows must
    agree between the full and the interrupted+resumed run."""
    import mdgan_tpu.metrics.fid as fid_mod
    from mdgan_tpu.cli.train import build_parser, config_from_args
    from mdgan_tpu.engine.train_loop import MDGANTrainer
    from mdgan_tpu.obs import spans as spans_lib

    class FakeTracker:
        def __init__(self, real):
            pass

        def score(self, fakes):
            return 1.0

        def inception_score(self, fakes, splits=1):
            return (2.0, 0.0)

    orig = fid_mod.FIDTracker
    fid_mod.FIDTracker = FakeTracker
    try:
        def cfg_for(sub, epochs, resume=False):
            argv = [
                "--dataset", "SyntheticMNIST", "--max_examples", "256",
                "--compute_dtype", "float32", "--mode", "mdgan",
                "--num_workers", "2", "--epochs", str(epochs),
                "--batch_size", "4", "--swap_interval", "10",
                "--log_interval", "15", "--chunk_size", "5",
                "--straggler_rate", "0.5",
                "--log_dir", str(tmp_path / sub / "logs"),
                "--image_dir", str(tmp_path / sub / "imgs"),
                "--weights_dir", str(tmp_path / sub / "weights"),
                "--checkpoint_dir", str(tmp_path / sub / "ckpt"),
            ] + (["--resume"] if resume else [])
            return config_from_args(build_parser().parse_args(argv))

        t_full = MDGANTrainer(cfg_for("full", 30))
        t_full.train()
        full_params = jax.device_get(t_full.state.g.params)
        t_full.close()

        t_half = MDGANTrainer(cfg_for("half", 16))  # final ckpt at round 15
        t_half.train()
        t_half.close()
        t_res = MDGANTrainer(cfg_for("half", 30, resume=True))
        assert int(t_res.state.step) == 16
        t_res.train()
        res_params = jax.device_get(t_res.state.g.params)
        t_res.close()

        for la, lb in zip(jax.tree_util.tree_leaves(full_params),
                          jax.tree_util.tree_leaves(res_params)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

        def nfb_by_epoch(sub):
            rows = spans_lib.read_spans(
                tmp_path / sub / "logs" / "mdgan.2.SyntheticMNIST.server.logs.csv")
            return {r["epoch"]: r["n_feedbacks"] for r in rows
                    if isinstance(r.get("n_feedbacks"), float)}

        full_nfb, res_nfb = nfb_by_epoch("full"), nfb_by_epoch("half")
        shared = set(full_nfb) & set(res_nfb)
        assert shared  # post-resume rows overlap the full run's
        assert all(full_nfb[e] == res_nfb[e] for e in shared)
    finally:
        fid_mod.FIDTracker = orig


@pytest.mark.slow
def test_trainer_csv_has_n_feedbacks_column(tmp_path):
    """A --straggler_rate run writes the superset n_feedbacks column on every
    server row; parity runs (rate 0) keep the golden-pinned schema."""
    import mdgan_tpu.metrics.fid as fid_mod
    from mdgan_tpu.cli.train import build_parser, config_from_args
    from mdgan_tpu.engine.train_loop import MDGANTrainer
    from mdgan_tpu.obs import spans as spans_lib

    class FakeTracker:
        def __init__(self, real):
            pass

        def score(self, fakes):
            return 1.0

        def inception_score(self, fakes, splits=1):
            return (2.0, 0.0)

    orig = fid_mod.FIDTracker
    fid_mod.FIDTracker = FakeTracker
    try:
        def cfg_for(sub, extra):
            base = [
                "--dataset", "SyntheticMNIST", "--max_examples", "256",
                "--compute_dtype", "float32", "--num_workers", "4",
                "--mode", "mdgan", "--epochs", "30", "--batch_size", "4",
                "--swap_interval", "0", "--log_interval", "15",
                "--chunk_size", "10",
                "--log_dir", str(tmp_path / sub / "logs"),
                "--image_dir", str(tmp_path / sub / "imgs"),
                "--weights_dir", str(tmp_path / sub / "weights"),
                "--checkpoint_dir", str(tmp_path / sub / "ckpt"),
            ]
            return config_from_args(build_parser().parse_args(base + extra))

        tr = MDGANTrainer(cfg_for("straggle", ["--straggler_rate", "0.5"]))
        tr.train()
        tr.close()
        rows = spans_lib.read_spans(
            tmp_path / "straggle" / "logs" / "mdgan.4.SyntheticMNIST.server.logs.csv")
        assert rows and all("n_feedbacks" in r for r in rows)
        vals = [r["n_feedbacks"] for r in rows]
        assert all(v is not None and 1 <= v <= 4 for v in vals)

        tr0 = MDGANTrainer(cfg_for("parity", []))
        tr0.train()
        tr0.close()
        rows0 = spans_lib.read_spans(
            tmp_path / "parity" / "logs" / "mdgan.4.SyntheticMNIST.server.logs.csv")
        assert rows0 and all("n_feedbacks" not in r for r in rows0)
    finally:
        fid_mod.FIDTracker = orig
