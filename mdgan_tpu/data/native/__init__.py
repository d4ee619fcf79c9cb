"""ctypes bindings for the native (C++) data path.

Compiles ``fastloader.cpp`` on first use (g++, cached next to the source) and
exposes:

  * :func:`decode_cifar10_bin` — CIFAR-10 binary-format decode to NHWC uint8
  * :func:`decode_mnist` — MNIST idx decode
  * :func:`gather_rows` — threaded row gather (shard materialization)

Every entry point returns None/False on any failure (no compiler, missing
files) and callers fall back to the pure-numpy path, so the native layer is a
strict accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).parent
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[Path]:
    so = _HERE / "libfastloader.so"
    src = _HERE / "fastloader.cpp"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread",
             str(src), "-o", str(so)],
            check=True, capture_output=True, timeout=120,
        )
        return so
    except (OSError, subprocess.SubprocessError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("MDGAN_TPU_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None
        lib.decode_cifar10_bin.restype = ctypes.c_int64
        lib.decode_cifar10_bin.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int]
        lib.decode_mnist_idx.restype = ctypes.c_int64
        lib.decode_mnist_idx.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.decode_mnist_labels.restype = ctypes.c_int64
        lib.decode_mnist_labels.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
        lib.gather_rows.restype = None
        lib.gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        _LIB = lib
        return _LIB


def decode_cifar10_bin(dir_path: str, max_examples: int = 50000,
                       train: bool = True) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((max_examples, 32, 32, 3), np.uint8)
    labels = np.empty(max_examples, np.int64)
    n = lib.decode_cifar10_bin(
        str(dir_path).encode(), out.ctypes.data, labels.ctypes.data,
        max_examples, 1 if train else 0)
    if n <= 0:
        return None
    return out[:n], labels[:n]


def decode_mnist(images_path: str, labels_path: Optional[str],
                 max_examples: int = 60000) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(max_examples * 28 * 28, np.uint8)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    n = lib.decode_mnist_idx(str(images_path).encode(), buf.ctypes.data,
                             max_examples, buf.size,
                             ctypes.byref(rows), ctypes.byref(cols))
    if n <= 0:
        return None
    images = buf[: n * rows.value * cols.value].reshape(n, rows.value, cols.value, 1)
    labels = np.zeros(n, np.int64)
    if labels_path:
        lbl = np.empty(n, np.int64)
        m = lib.decode_mnist_labels(str(labels_path).encode(), lbl.ctypes.data, n)
        if m == n:
            labels = lbl
    return images, labels


def gather_rows(data: np.ndarray, idx: np.ndarray,
                num_threads: Optional[int] = None) -> Optional[np.ndarray]:
    """out[i] = data[idx[i]]; threaded memcpy. None if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data)
    idx = np.ascontiguousarray(idx.reshape(-1), dtype=np.int64)
    row_bytes = int(np.prod(data.shape[1:])) * data.dtype.itemsize
    out = np.empty((len(idx),) + data.shape[1:], data.dtype)
    if num_threads is None:
        num_threads = min(8, os.cpu_count() or 1)
    lib.gather_rows(data.ctypes.data, idx.ctypes.data, out.ctypes.data,
                    len(idx), row_bytes, num_threads)
    return out
