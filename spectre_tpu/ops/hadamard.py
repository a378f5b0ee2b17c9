"""Fast Walsh-Hadamard transforms.

Capability parity with the reference FWHT library
(``/root/reference/spectre_vit/models/spectre/hadamar.py``), which ships three
variants:

- ``fwht``               cat-based butterfly, normalized by default (hadamar.py:12-32)
- ``fwht_fast``          interleaved butterfly, UNnormalized, with an in-place
                         write that breaks torch autograd (hadamar.py:58-80) —
                         here it is purely functional and differentiable
- ``hadamard_transform`` normalized 1D/2D variant (hadamar.py:83-112); it
                         computes the same transform as ``fwht(normalize=True)``

All are jnp-traceable (static shapes, unrolled log2(N) stages → XLA fuses the
adds into a handful of kernels). The Pallas in-VMEM butterfly kernel lives in
``spectre_tpu.ops.pallas.fwht`` behind the same signatures.
"""

from __future__ import annotations

import jax.numpy as jnp


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (hadamar.py:8-9)."""
    return 1 << (int(n) - 1).bit_length()


def _check_pow2(n: int):
    if n & (n - 1) or n == 0:
        raise ValueError(f"FWHT length must be a power of 2, got {n}")


def fwht(x: jnp.ndarray, axis: int = -1, normalize: bool = True) -> jnp.ndarray:
    """Walsh-Hadamard transform, natural (Hadamard) ordering.

    Matches the reference ``fwht`` (hadamar.py:12-32) bit-exactly: butterfly
    splits each 2h-block into two h-halves, emitting (a+b, a-b).
    """
    n = x.shape[axis]
    _check_pow2(n)
    x = jnp.moveaxis(x, axis, -1)
    shape = x.shape
    x = x.reshape(-1, n)

    h = 1
    while h < n:
        x = x.reshape(-1, n // (2 * h), 2, h)
        a = x[:, :, 0, :]
        b = x[:, :, 1, :]
        x = jnp.concatenate((a + b, a - b), axis=-1)
        h *= 2

    x = x.reshape(shape)
    if normalize:
        x = x * (n ** -0.5)
    return jnp.moveaxis(x, -1, axis)


def fwht_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-output FWHT over the last axis, unnormalized.

    Matches the reference ``fwht_fast`` (hadamar.py:58-80): each stage writes
    (a+b) to even lanes and (a-b) to odd lanes. Functional — no in-place
    update, so it is differentiable (the reference's ``x[..., 1::2] = a - b``
    at hadamar.py:76 is autograd-hostile; SURVEY.md §7 "known bugs").
    """
    shape = x.shape
    n = shape[-1]
    _check_pow2(n)
    x = x.reshape(-1, n)
    m = x.shape[0]

    h = 1
    while h < n:
        x = x.reshape(m, -1, 2 * h)
        a = x[..., :h]
        b = x[..., h : 2 * h]
        x = jnp.stack((a + b, a - b), axis=-1).reshape(m, -1, 2 * h)
        h *= 2

    return x.reshape(shape)


def hadamard_transform(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized FWHT for 1D vectors or [B, D] batches (hadamar.py:83-112).

    Computes the same transform as ``fwht(x, normalize=True)``; kept as a
    distinct public symbol for API parity with the reference.
    """
    if x.ndim not in (1, 2):
        raise ValueError("input's dimension must be either 1 or 2")
    return fwht(x, axis=-1, normalize=True)


def learnable_hadamard(
    x: jnp.ndarray, scales: list[jnp.ndarray] | tuple[jnp.ndarray, ...]
) -> jnp.ndarray:
    """Residual Hadamard block (reference ``LearnableHadamard``, hadamar.py:115-141).

    Pads the last dim to a power of two, applies one unnormalized interleaved
    FWHT pass per scale (each pass multiplied by its learnable per-lane scale
    — the reference defined the scales but left the multiply commented out at
    hadamar.py:135-136; here it is active, which is the documented intent),
    crops back, and adds the residual.
    """
    orig_dim = x.shape[-1]
    dim = next_pow2(orig_dim)
    residual = x
    if dim != orig_dim:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, dim - orig_dim)]
        x = jnp.pad(x, pad)
    for p in scales:
        x = fwht_interleaved(x) * p
    x = x[..., :orig_dim]
    return x + residual
