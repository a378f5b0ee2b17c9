"""Haar discrete wavelet transforms.

The reference consumed wavelets only through third-party libs
(``pytorch_wavelets.DWTForward`` in dwt_experiments.py:9,56 and ptwt/pywt
deps, pyproject.toml:23-28) and promised dwt_embed/dwt_token mixers in its
layer docstring (spectre.py:30-36) without implementing them. Here the Haar
DWT is first-party: a fixed 2-tap lifting stencil, expressed with static
reshapes so XLA maps it onto the VPU.

Conventions match pywt's "haar" with zero-padding mode: approx = (a+b)/sqrt(2),
detail = (a-b)/sqrt(2) over non-overlapping pairs.
"""

from __future__ import annotations

import jax.numpy as jnp

_SQRT2 = 2.0 ** 0.5


def haar_dwt1d(x: jnp.ndarray, axis: int = -1) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level 1D Haar DWT along ``axis`` (even length required).

    Returns (approx, detail), each of half length.
    """
    n = x.shape[axis]
    if n % 2:
        raise ValueError(f"haar_dwt1d needs even length, got {n}")
    x = jnp.moveaxis(x, axis, -1)
    shape = x.shape[:-1]
    x = x.reshape(*shape, n // 2, 2)
    a = (x[..., 0] + x[..., 1]) / _SQRT2
    d = (x[..., 0] - x[..., 1]) / _SQRT2
    return jnp.moveaxis(a, -1, axis), jnp.moveaxis(d, -1, axis)


def haar_idwt1d(approx: jnp.ndarray, detail: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inverse of :func:`haar_dwt1d`."""
    a = jnp.moveaxis(approx, axis, -1)
    d = jnp.moveaxis(detail, axis, -1)
    even = (a + d) / _SQRT2
    odd = (a - d) / _SQRT2
    x = jnp.stack([even, odd], axis=-1).reshape(*a.shape[:-1], a.shape[-1] * 2)
    return jnp.moveaxis(x, -1, axis)


def haar_dwt_mix(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Shape-preserving Haar mixer: concat(approx, detail) along ``axis``.

    This is the dwt_embed / dwt_token mixing configuration from the reference
    docstring contract (spectre.py:30-36): an orthogonal transform of the
    chosen axis, same shape in/out so the encoder residuals type-check.
    For odd lengths the last element is passed through unscaled (zero-pad
    lifting).
    """
    n = x.shape[axis]
    if n % 2 == 0:
        a, d = haar_dwt1d(x, axis=axis)
        return jnp.concatenate([a, d], axis=axis)
    xm = jnp.moveaxis(x, axis, -1)
    head, tail = xm[..., : n - 1], xm[..., n - 1 :]
    a, d = haar_dwt1d(head, axis=-1)
    out = jnp.concatenate([a, tail, d], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def haar_dwt2d(x: jnp.ndarray) -> tuple[jnp.ndarray, tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Single-level 2D Haar DWT over the last two axes.

    Returns (LL, (LH, HL, HH)) in pytorch_wavelets' (approx, (H, V, D))
    ordering — H = horizontal detail (rows low, cols high), V = vertical,
    D = diagonal — the subband layout the reference's DWT study plots
    (dwt_experiments.py:27-69).
    """
    lo_r, hi_r = haar_dwt1d(x, axis=-2)
    ll, lh = haar_dwt1d(lo_r, axis=-1)
    hl, hh = haar_dwt1d(hi_r, axis=-1)
    return ll, (lh, hl, hh)


def haar_idwt2d(
    ll: jnp.ndarray, highs: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
) -> jnp.ndarray:
    lh, hl, hh = highs
    lo_r = haar_idwt1d(ll, lh, axis=-1)
    hi_r = haar_idwt1d(hl, hh, axis=-1)
    return haar_idwt1d(lo_r, hi_r, axis=-2)


def haar_dwt2d_multilevel(x: jnp.ndarray, levels: int):
    """J-level 2D decomposition (DWTForward(J=levels) equivalent,
    dwt_experiments.py:56). Returns (LL_J, [highs_1, ..., highs_J])."""
    highs = []
    ll = x
    for _ in range(levels):
        ll, h = haar_dwt2d(ll)
        highs.append(h)
    return ll, highs
