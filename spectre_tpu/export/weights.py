"""Flat binary weights format (.stw) for the native inference runner.

The reference ghost-shipped a Rust inference crate consuming ONNX + a sample
image (SURVEY.md §2.1 "ghost native component"; .gitignore:24,
vit_spectre_cifar100.py:251). The TPU framework's native runner is C++
(native/inference/) and consumes this format: a self-describing little-endian
container of named tensors, mmap-friendly, no deps.

Layout:
    magic  "STW1"
    u32    n_tensors
    per tensor:
        u32 name_len | name bytes (utf-8)
        u32 dtype    (0 = f32, 1 = i32)
        u32 ndim | u32 dims[ndim]
        raw data (little-endian, C order)
"""

from __future__ import annotations

import struct

import jax
import numpy as np

_MAGIC = b"STW1"
_DTYPES = {0: np.float32, 1: np.int32}
_CODES = {np.dtype(np.float32): 0, np.dtype(np.int32): 1}


def _key_name(k) -> str:
    for attr in ("key", "idx", "name"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def _flatten(variables, prefix="") -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        name = ".".join(_key_name(k) for k in path)
        arr = np.asarray(leaf)
        if arr.dtype == np.bool_:
            arr = arr.astype(np.int32)
        if arr.dtype not in (np.float32, np.int32):
            arr = arr.astype(np.float32) if arr.dtype.kind == "f" else arr.astype(np.int32)
        flat[prefix + name] = arr
    return flat


def save_weights_bin(variables, path: str) -> str:
    flat = _flatten(variables)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(flat)))
        for name in sorted(flat):
            arr = np.ascontiguousarray(flat[name])
            nb = name.encode()
            f.write(struct.pack("<I", len(nb)))
            f.write(nb)
            f.write(struct.pack("<I", _CODES[arr.dtype]))
            f.write(struct.pack("<I", arr.ndim))
            f.write(struct.pack(f"<{arr.ndim}I", *arr.shape))
            f.write(arr.tobytes())
    return path


def load_weights_bin(path: str) -> dict[str, np.ndarray]:
    out = {}
    with open(path, "rb") as f:
        assert f.read(4) == _MAGIC, "bad magic"
        (n,) = struct.unpack("<I", f.read(4))
        for _ in range(n):
            (nl,) = struct.unpack("<I", f.read(4))
            name = f.read(nl).decode()
            (code,) = struct.unpack("<I", f.read(4))
            (ndim,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{ndim}I", f.read(4 * ndim)) if ndim else ()
            dtype = _DTYPES[code]
            count = int(np.prod(dims)) if dims else 1
            out[name] = np.frombuffer(
                f.read(count * dtype().itemsize), dtype=dtype).reshape(dims)
    return out
