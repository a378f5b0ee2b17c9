"""Shared Pallas plumbing: interpret-mode fallback + tiling helpers."""

from __future__ import annotations

import functools

import jax

# Platforms with a Mosaic (TPU) lowering path. The axon PJRT plugin fronts a
# real TPU; everything else (cpu test meshes) runs kernels in interpret mode
# so the same code path is exercised everywhere.
_TPU_PLATFORMS = ("tpu", "axon")


@functools.lru_cache(maxsize=1)
def use_interpret() -> bool:
    try:
        return jax.default_backend() not in _TPU_PLATFORMS
    except Exception:
        return True


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
