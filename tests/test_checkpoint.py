"""Checkpoint / resume tests — the rebuild's superset of the reference's
save-only weights path (SURVEY.md §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdgan_tpu.core.config import TrainConfig
from mdgan_tpu.core.registry import get as get_spec
from mdgan_tpu.data.partitioner import shard_data
from mdgan_tpu.data.sampler import ShardSampler
from mdgan_tpu.engine.mdgan import MDGANEngine
from mdgan_tpu.utils import checkpoint as ckpt_lib


def _setup(n=2, b=4):
    spec = get_spec("SyntheticMNIST")
    cfg = TrainConfig(batch_size=b, chunk_size=2, compute_dtype="float32",
                      donate=False)
    eng = MDGANEngine(spec, cfg, num_workers=n)
    data, _ = spec.load("data", max_examples=64)
    shards, _ = shard_data(data, n, iid=True, seed=0)
    return eng, jnp.asarray(shards), cfg


@pytest.mark.slow
def test_full_state_roundtrip_and_bitwise_resume(tmp_path):
    """Train 2 chunks; checkpoint; train 2 more; vs. restore-at-2 + 2 more.
    Final states must be bit-identical (true resume, which the reference
    cannot do at all)."""
    eng, shards, cfg = _setup()
    sampler = ShardSampler(2, shards.shape[1], cfg.batch_size, seed=0)
    rng = np.random.default_rng(3)
    st = eng.init_state(seed=11)
    run = eng.chunk_fn(cfg.chunk_size)

    st, _ = run(st, shards, jnp.asarray(sampler.next_chunk(cfg.chunk_size)))

    mgr = ckpt_lib.CheckpointManager(tmp_path / "ck")
    mgr.save(int(st.step), st, sampler_state=sampler.state_dict(),
             host_rng_state=ckpt_lib.host_rng_state(rng))

    # continue original
    st_cont, _ = run(st, shards, jnp.asarray(sampler.next_chunk(cfg.chunk_size)))
    perm_cont = rng.permutation(2)

    # restore and continue
    st2, sampler_state, host_rng, step = mgr.restore(eng.init_state(seed=0))
    assert step == 2
    sampler2 = ShardSampler(2, shards.shape[1], cfg.batch_size, seed=0)
    sampler2.load_state_dict(sampler_state)
    rng2 = ckpt_lib.restore_host_rng(host_rng)
    st2_cont, _ = run(st2, shards, jnp.asarray(sampler2.next_chunk(cfg.chunk_size)))
    perm_rest = rng2.permutation(2)

    for la, lb in zip(jax.tree.leaves(st_cont.g.params),
                      jax.tree.leaves(st2_cont.g.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for la, lb in zip(jax.tree.leaves(st_cont.d.opt),
                      jax.tree.leaves(st2_cont.d.opt)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(perm_cont, perm_rest)
    mgr.close()


@pytest.mark.slow
def test_prng_key_survives_roundtrip(tmp_path):
    eng, shards, cfg = _setup()
    st = eng.init_state(seed=5)
    mgr = ckpt_lib.CheckpointManager(tmp_path / "ck")
    mgr.save(0, st)
    st2, _, _, _ = mgr.restore(eng.init_state(seed=0))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(st.key)),
        np.asarray(jax.random.key_data(st2.key)))
    # restored key is usable
    jax.random.normal(jax.random.fold_in(st2.key, 0), (2,))
    mgr.close()


def test_weights_only_roundtrip(tmp_path):
    eng, _, _ = _setup()
    st = eng.init_state(seed=2)
    path = tmp_path / "g.npz"
    ckpt_lib.save_weights_only(path, st.g.params, st.g.stats)
    params, stats = ckpt_lib.load_weights_only(path)
    for la, lb in zip(jax.tree.leaves(st.g.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_retention(tmp_path):
    eng, shards, cfg = _setup()
    st = eng.init_state(seed=0)
    mgr = ckpt_lib.CheckpointManager(tmp_path / "ck", max_to_keep=2)
    for step in [1, 2, 3, 4]:
        mgr.save(step, st)
    assert mgr.latest_step() == 4
    # only 2 kept
    st_r, _, _, step = mgr.restore(st)
    assert step == 4
    mgr.close()


def test_compilation_cache_helper(tmp_path, monkeypatch):
    """enable_compilation_cache honors the env override, creates the dir,
    and points jax's persistent cache at it (utils/compilation_cache.py —
    called by every CLI entry; REPORT notes warm starts depend on it)."""
    import jax

    from mdgan_tpu.utils.compilation_cache import enable_compilation_cache

    target = tmp_path / "xla_cache"
    monkeypatch.setenv("MDGAN_TPU_COMPILE_CACHE", str(target))
    old = jax.config.jax_compilation_cache_dir
    try:
        got = enable_compilation_cache()
        assert got == str(target)
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)
        # explicit argument wins over the env var
        target2 = tmp_path / "xla_cache2"
        assert enable_compilation_cache(str(target2)) == str(target2)
        assert target2.is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
