"""Native (C++) data-path tests: decode round-trips and gather parity.

The native layer must be a strict accelerator: every test also asserts the
pure-python path produces identical results.
"""

import struct

import numpy as np
import pytest

from mdgan_tpu.data import builtin, native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_gather_rows_matches_numpy(lib):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (1000, 7, 3), dtype=np.uint8)
    idx = rng.integers(0, 1000, 5000)
    got = native.gather_rows(data, idx)
    np.testing.assert_array_equal(got, data[idx])
    # float rows too
    dataf = rng.normal(size=(500, 16)).astype(np.float32)
    idx2 = rng.integers(0, 500, 123)
    np.testing.assert_array_equal(native.gather_rows(dataf, idx2), dataf[idx2])


def test_cifar_bin_decode(lib, tmp_path):
    """Write binary-format CIFAR batches; native decode must equal the known
    CHW->HWC layout and agree with the loader dispatch."""
    rng = np.random.default_rng(1)
    d = tmp_path / "cifar-10-batches-bin"
    d.mkdir()
    n_per = 20
    all_imgs, all_labels = [], []
    for b in range(1, 6):
        recs = bytearray()
        for i in range(n_per):
            label = rng.integers(0, 10)
            chw = rng.integers(0, 256, (3, 32, 32), dtype=np.uint8)
            recs += bytes([label]) + chw.tobytes()
            all_imgs.append(chw.transpose(1, 2, 0))
            all_labels.append(label)
        (d / f"data_batch_{b}.bin").write_bytes(bytes(recs))
    imgs, labels = native.decode_cifar10_bin(d, 100, train=True)
    np.testing.assert_array_equal(imgs, np.stack(all_imgs))
    np.testing.assert_array_equal(labels, np.array(all_labels))
    # through the public loader
    data2, labels2 = builtin.load_cifar10(str(tmp_path))
    np.testing.assert_array_equal(data2, imgs)
    # max_examples respected
    data3, _ = builtin.load_cifar10(str(tmp_path), max_examples=7)
    assert len(data3) == 7


def test_mnist_idx_decode(lib, tmp_path):
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (15, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, 15).astype(np.uint8)
    ipath = tmp_path / "train-images-idx3-ubyte"
    lpath = tmp_path / "train-labels-idx1-ubyte"
    ipath.write_bytes(struct.pack(">IIII", 0x803, 15, 28, 28) + imgs.tobytes())
    lpath.write_bytes(struct.pack(">II", 0x801, 15) + labels.tobytes())
    got, glabels = native.decode_mnist(ipath, lpath)
    np.testing.assert_array_equal(got[..., 0], imgs)
    np.testing.assert_array_equal(glabels, labels)
    # through the public loader
    data2, labels2 = builtin.load_mnist(str(tmp_path))
    np.testing.assert_array_equal(data2, got)
    np.testing.assert_array_equal(labels2, glabels)


def test_corrupt_files_fall_through(lib, tmp_path):
    (tmp_path / "train-images-idx3-ubyte").write_bytes(b"garbage")
    assert native.decode_mnist(tmp_path / "train-images-idx3-ubyte", None) is None
    d = tmp_path / "cifar-10-batches-bin"
    d.mkdir()
    assert native.decode_cifar10_bin(d, 10) is None  # missing batch files


def test_shard_data_native_path_matches(lib):
    """shard_data must give identical results through the native gather."""
    import os

    from mdgan_tpu.data.partitioner import shard_data

    rng = np.random.default_rng(3)
    # > 64 MB to trigger the native path
    data = rng.integers(0, 256, (70000, 32, 32, 1), dtype=np.uint8)
    s1, i1 = shard_data(data, 4, iid=True, seed=0)
    os.environ["MDGAN_TPU_NO_NATIVE"] = "1"
    try:
        native._TRIED, native._LIB = False, None
        s2, i2 = shard_data(data, 4, iid=True, seed=0)
    finally:
        del os.environ["MDGAN_TPU_NO_NATIVE"]
        native._TRIED, native._LIB = False, None
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(s1, s2)


def test_mnist_oversized_dims_rejected(lib, tmp_path):
    """Header dims beyond the buffer must be rejected, not overflow the heap."""
    import struct as st

    big = tmp_path / "train-images-idx3-ubyte"
    # claims 100 examples of 64x64 (> the 28x28-sized buffer for 100)
    big.write_bytes(st.pack(">IIII", 0x803, 100, 64, 64) + b"\0" * (100 * 64 * 64))
    assert native.decode_mnist(big, None, max_examples=100) is None
