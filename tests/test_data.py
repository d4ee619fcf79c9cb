"""Partitioner / sampler / loader tests.

Partition semantics mirror reference ``src/actors/server.py:46-64``
(seeded randperm or arange, torch.chunk'd into N pieces).
"""

import numpy as np
import pytest

from mdgan_tpu.data import builtin
from mdgan_tpu.data.partitioner import (
    shard_data,
    split_indices,
    split_indices_equal,
    torch_chunk_sizes,
)
from mdgan_tpu.data.sampler import ShardSampler


def test_torch_chunk_sizes_matches_torch():
    torch = pytest.importorskip("torch")
    for size, n in [(10, 4), (50000, 8), (50000, 3), (7, 7), (5, 8), (100, 6)]:
        ours = torch_chunk_sizes(size, n)
        theirs = [len(c) for c in torch.chunk(torch.arange(size), n)]
        theirs += [0] * (n - len(theirs))
        assert ours == theirs, (size, n)


def test_split_indices_non_overlapping_cover():
    parts = split_indices(1000, 4, iid=True, seed=0)
    allidx = np.concatenate(parts)
    assert len(allidx) == 1000
    assert len(np.unique(allidx)) == 1000
    # IID split is a shuffle, not contiguous
    assert not np.all(parts[0] == np.arange(len(parts[0])))


def test_split_non_iid_contiguous():
    parts = split_indices(100, 4, iid=False)
    np.testing.assert_array_equal(parts[0], np.arange(25))
    np.testing.assert_array_equal(parts[3], np.arange(75, 100))


def test_split_equal_shapes_and_determinism():
    a = split_indices_equal(103, 4, iid=True, seed=1)
    b = split_indices_equal(103, 4, iid=True, seed=1)
    assert a.shape == (4, 25)
    np.testing.assert_array_equal(a, b)
    assert len(np.unique(a)) == 100  # disjoint


def test_shard_data_gathers_rows():
    data = np.arange(24, dtype=np.uint8).reshape(12, 2)
    shards, idx = shard_data(data, 3, iid=True, seed=0)
    assert shards.shape == (3, 4, 2)
    np.testing.assert_array_equal(shards, data[idx])


def test_sampler_without_replacement_epochs():
    s = ShardSampler(num_workers=2, shard_size=10, batch_size=3, seed=0)
    idx = s.next_chunk(6)  # 6 steps x 3 = 18 draws; epoch = 3 batches (9 idx), tail dropped
    assert idx.shape == (6, 2, 3)
    for w in range(2):
        first_epoch = idx[:3, w].reshape(-1)
        assert len(np.unique(first_epoch)) == 9  # no repeats within an epoch
        second_epoch = idx[3:6, w].reshape(-1)
        assert len(np.unique(second_epoch)) == 9
    # workers draw different streams
    assert not np.array_equal(idx[:, 0], idx[:, 1])


def test_sampler_state_roundtrip():
    s = ShardSampler(2, 10, 3, seed=5)
    s.next_chunk(4)
    saved = {k: np.copy(v) if hasattr(v, "copy") else v for k, v in s.state_dict().items()}
    expect = s.next_chunk(3)
    s2 = ShardSampler(2, 10, 3, seed=5)
    s2.load_state_dict(saved)
    np.testing.assert_array_equal(s2.next_chunk(3), expect)


def test_synthetic_deterministic():
    a, la = builtin.synthesize((32, 32, 3), 64, seed=1)
    b, lb = builtin.synthesize((32, 32, 3), 64, seed=1)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (64, 32, 32, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(la, lb)
    c, _ = builtin.synthesize((32, 32, 3), 64, seed=2)
    assert not np.array_equal(a, c)


def test_loaders_fall_back_to_synthetic(tmp_path):
    data, labels = builtin.load_cifar10(str(tmp_path), max_examples=32)
    assert data.shape == (32, 32, 32, 3)
    data, labels = builtin.load_mnist(str(tmp_path), max_examples=16)
    assert data.shape == (16, 28, 28, 1)


def test_loader_reads_real_cifar_format(tmp_path):
    """Write a CIFAR-10-format pickle batch and confirm it round-trips."""
    import pickle

    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (10, 3072), dtype=np.uint8)
    for i in range(1, 6):
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": raw, b"labels": list(range(10))}, f)
    data, labels = builtin.load_cifar10(str(tmp_path))
    assert data.shape == (50, 32, 32, 3)
    # NCHW -> NHWC transpose correctness
    np.testing.assert_array_equal(
        data[0], raw[0].reshape(3, 32, 32).transpose(1, 2, 0)
    )


def test_celeba_jpg_folder_loader(tmp_path):
    """CelebA jpg path: center-crop + resize to 64 (reference CelebA.py:29-35)."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    d = tmp_path / "img_align_celeba"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        # non-square source (178x218 like real CelebA)
        arr = rng.integers(0, 256, (218, 178, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{i:06d}.jpg")
    data, labels = builtin.load_celeba(str(tmp_path))
    assert data.shape == (4, 64, 64, 3)
    assert data.dtype == np.uint8
    # content is real (not all-zero) and distinct across files
    assert data.std() > 10
    assert not np.array_equal(data[0], data[1])


def test_mu_dtype_bf16_option():
    """bfloat16 first-moment option changes only the mu dtype."""
    import jax
    import jax.numpy as jnp

    from mdgan_tpu.core.config import OptimizerConfig
    from mdgan_tpu.engine.state import make_optimizer

    params = {"w": jnp.zeros((8, 8))}
    tx = make_optimizer(OptimizerConfig(mu_dtype="bfloat16"))
    st = tx.init(params)
    assert st[0].mu["w"].dtype == jnp.bfloat16
    assert st[0].nu["w"].dtype == jnp.float32
    tx32 = make_optimizer(OptimizerConfig())
    assert tx32.init(params)[0].mu["w"].dtype == jnp.float32


def test_moment_dtype_bf16_tracks_f32_trajectory():
    """bfloat16 mu+nu storage: correct dtypes, identical state STRUCTURE to
    optax.adam, and a few Adam steps stay within bf16 rounding of the f32
    trajectory (updates compute in f32; only the carried moments round)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mdgan_tpu.core.config import OptimizerConfig
    from mdgan_tpu.engine.state import make_optimizer

    params = {"w": jnp.ones((8, 128)) * 0.1, "b": jnp.zeros((128,))}
    tx16 = make_optimizer(OptimizerConfig(mu_dtype="bfloat16", nu_dtype="bfloat16"))
    tx32 = make_optimizer(OptimizerConfig())
    st16, st32 = tx16.init(params), tx32.init(params)
    assert st16[0].mu["w"].dtype == jnp.bfloat16
    assert st16[0].nu["w"].dtype == jnp.bfloat16
    assert (jax.tree.structure(st16) == jax.tree.structure(st32))

    import optax

    p16, p32 = params, params
    for step in range(5):
        g = jax.tree.map(
            lambda x, k=step: 0.01 * jnp.cos(x * (k + 1.0)), params)
        u16, st16 = tx16.update(g, st16, p16)
        u32, st32 = tx32.update(g, st32, p32)
        p16 = optax.apply_updates(p16, u16)
        p32 = optax.apply_updates(p32, u32)
        assert st16[0].nu["w"].dtype == jnp.bfloat16  # dtype stable across steps
    for a, b in zip(jax.tree.leaves(p16), jax.tree.leaves(p32)):
        assert a.dtype == jnp.float32  # params stay full precision
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-5)


def _idx_bytes(arr: np.ndarray) -> bytes:
    """Serialize an array in MNIST idx format (builtin._read_idx's inverse)."""
    import struct

    magic = (0x08 << 8) | arr.ndim  # dtype byte 0x08 = uint8
    head = struct.pack(">I", magic) + b"".join(
        struct.pack(">I", d) for d in arr.shape)
    return head + arr.astype(np.uint8).tobytes()


def test_download_mnist_offline_file_url(tmp_path):
    """--download path, fully offline: checksum-verified fetch from file://
    sources into the exact layout load_mnist reads (reference MNIST.py:42
    download=True equivalent, VERDICT r2 missing #4)."""
    import gzip
    import hashlib

    from mdgan_tpu.data import builtin
    from mdgan_tpu.data.download import MNIST_FILES, download_mnist

    rng = np.random.default_rng(0)
    src = tmp_path / "src"
    src.mkdir()
    checksums = {}
    shapes = {"images": (8, 28, 28), "labels": (8,)}
    for name, _ in MNIST_FILES:
        kind = "images" if "images" in name else "labels"
        raw = gzip.compress(_idx_bytes(
            rng.integers(0, 10 if kind == "labels" else 256,
                         shapes[kind], dtype=np.uint8)))
        (src / name).write_bytes(raw)
        checksums[name] = "sha256:" + hashlib.sha256(raw).hexdigest()

    data_dir = tmp_path / "data"
    out = download_mnist(str(data_dir), base_url=src.as_uri(),
                         checksums=checksums)
    assert sorted(p.name for p in out.iterdir()) == sorted(
        n for n, _ in MNIST_FILES)  # incl.: no .part.<pid> temp droppings
    data, labels = builtin.load_mnist(str(data_dir), fallback="error")
    assert data.shape == (8, 28, 28, 1) and labels.shape == (8,)

    # idempotent: second call keeps files, fetches nothing (sources removed)
    for name, _ in MNIST_FILES:
        (src / name).unlink()
    download_mnist(str(data_dir), base_url=src.as_uri(), checksums=checksums)


def test_download_cifar10_offline_and_checksum_rejection(tmp_path):
    """CIFAR-10 tar.gz fetch+extract from a file:// source; a wrong checksum
    must refuse to install anything (reference CIFAR10.py:37 equivalent)."""
    import hashlib
    import io
    import pickle
    import tarfile

    import pytest

    from mdgan_tpu.data import builtin
    from mdgan_tpu.data.download import download_cifar10

    rng = np.random.default_rng(1)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        names = [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]
        for name in names:
            payload = pickle.dumps({
                b"data": rng.integers(0, 256, (4, 3072), dtype=np.uint8),
                b"labels": list(rng.integers(0, 10, 4)),
            })
            info = tarfile.TarInfo(f"cifar-10-batches-py/{name}")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    raw = buf.getvalue()
    src = tmp_path / "src"
    src.mkdir()
    (src / "cifar-10-python.tar.gz").write_bytes(raw)

    # wrong checksum: refused, nothing installed
    bad_dir = tmp_path / "bad"
    with pytest.raises(ValueError, match="checksum mismatch"):
        download_cifar10(str(bad_dir), base_url=src.as_uri(),
                         checksum="sha256:" + "0" * 64)
    assert not (bad_dir / "cifar10" / "cifar-10-batches-py").exists()
    assert not list((bad_dir / "cifar10").glob("*.tar.gz*"))  # no .part either

    data_dir = tmp_path / "data"
    batches = download_cifar10(
        str(data_dir), base_url=src.as_uri(),
        checksum="sha256:" + hashlib.sha256(raw).hexdigest())
    assert batches.exists()
    # extraction stages through a per-process dir that must be cleaned up
    # (concurrent multi-process launches share --data_dir)
    assert not list((data_dir / "cifar10").glob(".extract.*"))
    assert not list((data_dir / "cifar10").glob("*.part.*"))
    data, labels = builtin.load_cifar10(str(data_dir), fallback="error")
    assert data.shape == (20, 32, 32, 3) and labels.shape == (20,)
