"""ctypes bindings for the native data-loading runtime (native/dataio).

Replaces the reference's multiprocess DataLoader decode path with a threaded
C++ library: CIFAR-100-binary / MNIST-IDX decode straight into numpy buffers
and threaded shuffled-batch gather. Falls back silently when the shared
library hasn't been built (``make -C native``) — the pure-python loaders in
data/datasets.py cover the same formats.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

def _lib_paths():
    """Candidate shared-library paths, env override FIRST and evaluated
    lazily (an import-time list would freeze the env var and could never
    override the default build)."""
    return [
        os.environ.get("SPECTRE_DATAIO_LIB", ""),
        os.path.join(os.path.dirname(__file__), "..", "..", "native",
                     "build", "libspectre_dataio.so"),
    ]


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for p in _lib_paths():
        if p and os.path.exists(p):
            lib = ctypes.CDLL(os.path.abspath(p))
            lib.dataio_load_cifar100_bin.restype = ctypes.c_int64
            lib.dataio_load_mnist_idx.restype = ctypes.c_int64
            lib.dataio_gather_batch.restype = None
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def load_cifar100_bin(path: str, max_n: int = 60000):
    lib = _load()
    assert lib is not None, "native dataio not built (make -C native)"
    images = np.empty((max_n, 3, 32, 32), np.float32)
    labels = np.empty((max_n,), np.int32)
    n = lib.dataio_load_cifar100_bin(
        path.encode(), _ptr(images, ctypes.c_float), _ptr(labels, ctypes.c_int32),
        ctypes.c_int64(max_n))
    if n < 0:
        raise IOError(f"native decode failed for {path}")
    return images[:n], labels[:n]


def load_mnist_idx(images_path: str, labels_path: str, max_n: int = 70000):
    lib = _load()
    assert lib is not None, "native dataio not built (make -C native)"
    images = np.empty((max_n, 1, 28, 28), np.float32)
    labels = np.empty((max_n,), np.int32)
    n = lib.dataio_load_mnist_idx(
        images_path.encode(), labels_path.encode(),
        _ptr(images, ctypes.c_float), _ptr(labels, ctypes.c_int32),
        ctypes.c_int64(max_n))
    if n < 0:
        raise IOError(f"native decode failed for {images_path}")
    return images[:n], labels[:n]


def gather_batch(images: np.ndarray, labels: np.ndarray, perm: np.ndarray):
    """Threaded shuffled-batch assembly: returns (images[perm], labels[perm])."""
    lib = _load()
    assert lib is not None, "native dataio not built (make -C native)"
    perm = np.ascontiguousarray(perm, np.int64)
    b = perm.shape[0]
    sample_elems = int(np.prod(images.shape[1:]))
    out_i = np.empty((b,) + images.shape[1:], np.float32)
    out_l = np.empty((b,), np.int32)
    lib.dataio_gather_batch(
        _ptr(images, ctypes.c_float), _ptr(labels, ctypes.c_int32),
        _ptr(perm, ctypes.c_int64), ctypes.c_int64(b),
        ctypes.c_int64(sample_elems),
        _ptr(out_i, ctypes.c_float), _ptr(out_l, ctypes.c_int32))
    return out_i, out_l
