"""Pallas op tests (interpret mode on CPU): fused Adam vs optax."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mdgan_tpu.ops.adam import FusedAdam


def _random_tree(key, specs):
    leaves = {}
    for i, (name, shape) in enumerate(specs):
        leaves[name] = jax.random.normal(jax.random.fold_in(key, i), shape)
    return leaves


@pytest.mark.parametrize("b1,b2", [(0.0, 0.999), (0.9, 0.999), (0.5, 0.9)])
def test_fused_adam_matches_optax(b1, b2):
    lr, eps = 2e-4, 1e-8
    # mixes pallas-eligible (lane-aligned) and fallback (odd-size) leaves
    specs = [
        ("conv", (4, 4, 64, 128)),       # 131072  -> pallas
        ("convT", (4, 4, 512, 100)),     # 819200  -> pallas (ragged tail)
        ("bn_scale", (256,)),            # 256     -> fallback (rows < 8)
        ("odd", (37, 3)),                # 111     -> fallback (not lane-aligned)
        ("stacked", (8, 4, 4, 128, 256)),  # stacked-worker leaf -> pallas
    ]
    params = _random_tree(jax.random.key(0), specs)
    tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    opt = tx.init(params)
    fused = FusedAdam(lr=lr, b1=b1, b2=b2, eps=eps)

    p_ref, o_ref = dict(params), opt
    p_fused, o_fused = dict(params), opt
    for step in range(3):
        grads = _random_tree(jax.random.fold_in(jax.random.key(1), step), specs)
        updates, o_ref = tx.update(grads, o_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_fused, o_fused = fused.update_in_place(grads, o_fused, p_fused)

        for name in p_ref:
            np.testing.assert_allclose(
                np.asarray(p_fused[name]), np.asarray(p_ref[name]),
                rtol=1e-6, atol=1e-7, err_msg=f"{name} step {step}")
        np.testing.assert_array_equal(np.asarray(o_fused[0].count),
                                      np.asarray(o_ref[0].count))
        for name in p_ref:
            np.testing.assert_allclose(
                np.asarray(o_fused[0].nu[name]), np.asarray(o_ref[0].nu[name]),
                rtol=1e-6, atol=1e-8)


def test_fused_adam_matches_optax_bf16_moments():
    """With bfloat16-stored moments (``--moment_dtype bfloat16``) the fused
    path must honor the storage dtypes and track the optax wrapper within
    bf16 rounding (both compute the update in f32, but they round the
    carried bf16 products at slightly different points)."""
    from mdgan_tpu.core.config import OptimizerConfig
    from mdgan_tpu.engine.state import make_optimizer

    lr, b1, b2, eps = 2e-4, 0.0, 0.999, 1e-8
    specs = [("conv", (4, 4, 64, 128)), ("bn_scale", (256,)), ("odd", (37, 3))]
    params = _random_tree(jax.random.key(0), specs)
    tx = make_optimizer(OptimizerConfig(lr=lr, beta_1=b1, beta_2=b2, eps=eps,
                                        mu_dtype="bfloat16",
                                        nu_dtype="bfloat16"))
    opt = tx.init(params)
    fused = FusedAdam(lr=lr, b1=b1, b2=b2, eps=eps)

    p_ref, o_ref = dict(params), opt
    p_fused, o_fused = dict(params), opt
    for step in range(3):
        grads = _random_tree(jax.random.fold_in(jax.random.key(1), step), specs)
        updates, o_ref = tx.update(grads, o_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_fused, o_fused = fused.update_in_place(grads, o_fused, p_fused)
        for name in p_ref:
            assert o_fused[0].mu[name].dtype == jnp.bfloat16
            assert o_fused[0].nu[name].dtype == jnp.bfloat16
            np.testing.assert_allclose(
                np.asarray(p_fused[name]), np.asarray(p_ref[name]),
                rtol=2e-2, atol=2e-6, err_msg=f"{name} step {step}")


def test_fused_adam_inside_scan():
    """Usable under lax.scan (the engine's chunked step)."""
    lr = 1e-3
    params = {"w": jax.random.normal(jax.random.key(0), (16, 128))}
    tx = optax.adam(lr, b1=0.0, b2=0.999)
    opt = tx.init(params)
    fused = FusedAdam(lr=lr, b1=0.0, b2=0.999, eps=1e-8)

    def body(carry, i):
        p, o = carry
        g = jax.tree.map(lambda a: a * 0.0 + i.astype(jnp.float32) * 1e-3, p)
        p, o = fused.update_in_place(g, o, p)
        return (p, o), 0.0

    (p2, o2), _ = jax.jit(
        lambda p, o: jax.lax.scan(body, (p, o), jnp.arange(5))
    )(params, opt)
    assert int(o2[0].count) == 5
    assert np.isfinite(np.asarray(p2["w"])).all()


@pytest.mark.slow
def test_engine_fused_matches_optax_engine():
    """Full MD-GAN chunk: use_pallas=True (fused adam, interpret on CPU) must
    match use_pallas=False numerically."""
    from mdgan_tpu.core.config import TrainConfig
    from mdgan_tpu.core.registry import get as get_spec
    from mdgan_tpu.data.partitioner import shard_data
    from mdgan_tpu.data.sampler import ShardSampler
    from mdgan_tpu.engine.mdgan import MDGANEngine

    spec = get_spec("SyntheticMNIST")
    data, _ = spec.load("data", max_examples=64)
    shards, _ = shard_data(data, 2, iid=True, seed=0)

    results = []
    for fused in (False, True):
        cfg = TrainConfig(batch_size=4, chunk_size=2, compute_dtype="float32",
                          donate=False, fused_adam=fused)
        eng = MDGANEngine(spec, cfg, num_workers=2)
        st = eng.init_state(seed=3)
        sampler = ShardSampler(2, shards.shape[1], 4, seed=0)
        st, _ = eng.chunk_fn(2)(st, jnp.asarray(shards), jnp.asarray(sampler.next_chunk(2)))
        results.append(jax.device_get(st.g.params))
    for la, lb in zip(jax.tree.leaves(results[0]), jax.tree.leaves(results[1])):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_engine_pallas_sampling_matches_gather():
    """pallas_sampling=True (interpret on CPU) must reproduce the XLA gather
    path bit-for-bit (CIFAR-shaped rows are 128-aligned)."""
    from mdgan_tpu.core.config import TrainConfig
    from mdgan_tpu.core.registry import get as get_spec
    from mdgan_tpu.data.partitioner import shard_data
    from mdgan_tpu.data.sampler import ShardSampler
    from mdgan_tpu.engine.mdgan import MDGANEngine

    spec = get_spec("Synthetic32")
    data, _ = spec.load("data", max_examples=64)
    shards, _ = shard_data(data, 2, iid=True, seed=0)

    results = []
    for pallas_sampling in (False, True):
        cfg = TrainConfig(batch_size=4, chunk_size=2, compute_dtype="float32",
                          donate=False, pallas_sampling=pallas_sampling)
        eng = MDGANEngine(spec, cfg, num_workers=2)
        st = eng.init_state(seed=3)
        dev_data = eng.shard_data(shards)
        sampler = ShardSampler(2, shards.shape[1], 4, seed=0)
        st, _ = eng.chunk_fn(2)(st, dev_data, jnp.asarray(sampler.next_chunk(2)))
        results.append(jax.device_get(st.g.params))
    for la, lb in zip(jax.tree.leaves(results[0]), jax.tree.leaves(results[1])):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6, atol=1e-7)


def test_sample_normalize_matches_reference_path():
    from mdgan_tpu.ops.losses import normalize_uint8
    from mdgan_tpu.ops.sampling import sample_normalize

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, (3, 50, 16, 8, 1), dtype=np.uint8))
    idx = jnp.asarray(rng.integers(0, 50, (3, 5)).astype(np.int32))
    got = sample_normalize(data, idx).reshape(3, 5, 16, 8, 1)
    want = normalize_uint8(jax.vmap(lambda s, i: s[i])(data, idx))
    # interpret mode may round differently by 1 ulp (fma ordering)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)
