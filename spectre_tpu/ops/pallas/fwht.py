"""Fast Walsh-Hadamard transform kernel.

Replaces the Dao-AILab CUDA ``fast_hadamard_transform`` the reference imports
(fft_experiments.py:9) and backs the FWHT library (hadamar.py). TPU
formulation: the Sylvester Hadamard matrix factors as a Kronecker product,
H_n = H_R (x) H_L with n = R*L row-major, so for X = x.reshape(R, L):

    FWHT(x) = H_R @ X @ H_L

The lane-dimension factor (L = up to 128 lanes) is ONE MXU matmul against the
dense H_L; the remaining R-dimension factor is log2(R) butterfly stages of
VPU adds over the sublane axis (R = n/128 is small: 8 for n=1024). All stages
run on a row tile resident in VMEM — the CUDA kernel's shared-memory butterfly
mapped onto MXU+VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectre_tpu.ops.pallas.common import cdiv, use_interpret
from spectre_tpu.ops.permute import hadamard_matrix

_TILE_M = 256
_MAX_LANE = 128


def _kernel(x_ref, h_ref, o_ref, *, r: int, l: int, scale: float):
    tm = x_ref.shape[0]
    x = x_ref[:].reshape(tm * r, l)
    y = jnp.dot(x, h_ref[:], preferred_element_type=jnp.float32)
    y = y.reshape(tm, r, l)
    # butterfly over the R axis (sublane-group adds)
    h = 1
    while h < r:
        y = y.reshape(tm, r // (2 * h), 2, h, l)
        a = y[:, :, 0]
        b = y[:, :, 1]
        y = jnp.concatenate((a + b, a - b), axis=2)  # [tm, r/2h, 2h, l]
        h *= 2
    o_ref[:] = (y.reshape(tm, r * l) * scale).astype(o_ref.dtype)


def _forward(x, normalize, interpret):
    interpret = use_interpret() if interpret is None else interpret
    n = x.shape[-1]
    if n & (n - 1):
        raise ValueError(f"FWHT length must be a power of 2, got {n}")
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, n)

    l = min(_MAX_LANE, n)
    r = n // l
    # unnormalized H_L; overall 1/sqrt(n) applied once at the end if requested
    h_l = hadamard_matrix(l, x.dtype, normalize=False)
    scale = float(n) ** -0.5 if normalize else 1.0
    # VMEM budget: the kernel holds ~4 tile-sized f32 temporaries (input,
    # matmul result, butterfly halves); keep the tile under ~2 MB so the
    # whole working set stays inside the 16 MB scoped-vmem limit
    budget_rows = max(8, (2 * 1024 * 1024) // (n * 4))
    tile_m = min(_TILE_M, budget_rows, max(8, m))

    out = pl.pallas_call(
        functools.partial(_kernel, r=r, l=l, scale=scale),
        grid=(cdiv(m, tile_m),),
        in_specs=[
            pl.BlockSpec((tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x2, h_l)
    return out.reshape(*lead, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fwht_pallas(
    x: jnp.ndarray, normalize: bool = True, interpret: bool | None = None
) -> jnp.ndarray:
    """FWHT over the last axis (power-of-two length), natural Hadamard order —
    bit-exact with ops.hadamard.fwht. Leading axes form the row grid.

    Custom VJP: the Hadamard matrix is symmetric, so the transform is
    self-adjoint — the backward pass is the SAME kernel applied to the
    cotangent (with the same normalization)."""
    return _forward(x, normalize, interpret)


def _fwd(x, normalize, interpret):
    return _forward(x, normalize, interpret), None


def _bwd(normalize, interpret, _res, g):
    return (_forward(g, normalize, interpret),)


fwht_pallas.defvjp(_fwd, _bwd)
