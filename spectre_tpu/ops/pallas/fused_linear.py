"""Fused SpectreLinear kernel: GELU(LayerNorm(x @ W + b)) + residual.

The reference SpectreLinear (layers.py:76-101) is Linear -> LayerNorm -> GELU
plus an AdaptiveAvgPool1d shortcut; three of these run per encoder layer plus
the head — the #2 hot op (SURVEY.md §3 "hot loops"). One Pallas program per
(row, K-block) grid cell accumulates the GEMM in an f32 VMEM scratch and runs
the whole epilogue (LN statistics, erf-GELU, residual) on the final K step,
so the [M, N] intermediate never round-trips HBM and W streams through VMEM
one [TK, N] block at a time (the un-tiled variant OOM'd VMEM at
K = E*H = 8192 on the flagship config).

Residual placement:
- K == N: identity shortcut fused into the epilogue (free).
- K != N: the adaptive-avg-pool residual is added by the caller — for the
  divisible case it is a reshape-mean (ops/linear.py), one cheap VPU pass;
  folding its matrix into this kernel would DOUBLE the MXU work of the
  largest GEMM in the model.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectre_tpu.ops.linear import adaptive_avg_pool1d
from spectre_tpu.ops.pallas.common import cdiv, use_interpret

_TILE_M = 256
_TILE_K = 512

# Abramowitz & Stegun 7.1.26 rational erf approximation (|err| <= 1.5e-7).
# Mosaic has no erf/erfc lowering; exp is supported, so the exact-GELU
# epilogue uses this in-kernel (parity-tested against jax.lax.erf).
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_ERF_P = 0.3275911


def _erf(x):
    sign = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + _ERF_P * z)
    poly = t * (_ERF_A[0] + t * (_ERF_A[1] + t * (_ERF_A[2] + t * (_ERF_A[3] + t * _ERF_A[4]))))
    return sign * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _kernel(x_ref, w_ref, b_ref, g_ref, bb_ref, o_ref, h_ref, acc_ref, *,
            eps, nk, identity_residual):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        h = acc_ref[:] + b_ref[:].astype(jnp.float32)
        h_ref[:] = h.astype(h_ref.dtype)  # pre-LN residual for the backward
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
        h = (h - mu) * jax.lax.rsqrt(var + eps)
        h = h * g_ref[:].astype(jnp.float32) + bb_ref[:].astype(jnp.float32)
        h = _gelu_exact(h)
        if identity_residual:
            h = h + x_ref[:].astype(jnp.float32)
        o_ref[:] = h.astype(o_ref.dtype)


def _forward(x, w, b, gamma, beta, eps, interpret):
    interpret = use_interpret() if interpret is None else interpret
    K, N = w.shape
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, K)
    tile_m = min(_TILE_M, max(8, m))
    identity = K == N
    tile_k = K if identity else min(_TILE_K, K)
    nk = cdiv(K, tile_k)
    grid = (cdiv(m, tile_m), nk)

    out, h = pl.pallas_call(
        functools.partial(_kernel, eps=eps, nk=nk, identity_residual=identity),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, N), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, N), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, N), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((m, N), x.dtype),
                   jax.ShapeDtypeStruct((m, N), x.dtype)],
        scratch_shapes=[pltpu.VMEM((tile_m, N), jnp.float32)],
        interpret=interpret,
    )(x2, w, b.reshape(1, N), gamma.reshape(1, N), beta.reshape(1, N))
    out = out.reshape(*lead, N)
    if not identity:
        out = out + adaptive_avg_pool1d(x, N)
    return out, h.reshape(*lead, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_spectre_linear(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Same contract as ops.linear.spectre_linear_apply: x [..., K] @ w [K, N]
    -> [..., N]. Leading axes are flattened into the row-tile grid.

    Differentiable via custom VJP: the Pallas kernel runs the forward and
    also emits the pre-LN activation ``h`` as a saved residual, so the
    backward is two GEMMs + the analytic LN/GELU chain — the forward GEMM is
    NOT recomputed (round-1's _bwd called jax.vjp of the jnp reference,
    re-running the full forward inside the backward — ~2x forward work per
    train step with use_pallas).
    """
    return _forward(x, w, b, gamma, beta, eps, interpret)[0]


def _fwd(x, w, b, gamma, beta, eps, interpret):
    out, h = _forward(x, w, b, gamma, beta, eps, interpret)
    return out, (x, w, gamma, beta, h)


def _bwd(eps, interpret, res, g):
    x, w, gamma, beta, h = res
    K, N = w.shape
    f32 = jnp.float32
    hf = h.astype(f32)
    gy = g.astype(f32)

    # LN statistics recomputed from the saved pre-LN h (two cheap reduces —
    # no forward GEMM rerun)
    mu = jnp.mean(hf, axis=-1, keepdims=True)
    var = jnp.mean((hf - mu) ** 2, axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    u = (hf - mu) * rsig
    z = u * gamma.astype(f32) + beta.astype(f32)

    # gelu'(z) = Phi(z) + z * phi(z)  (exact erf form)
    inv_sqrt2 = 2.0 ** -0.5
    phi = jnp.exp(-0.5 * z * z) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    dgelu = 0.5 * (1.0 + jax.lax.erf(z * inv_sqrt2)) + z * phi
    dz = gy * dgelu

    dgamma = jnp.sum(dz * u, axis=tuple(range(dz.ndim - 1)))
    dbeta = jnp.sum(dz, axis=tuple(range(dz.ndim - 1)))

    du = dz * gamma.astype(f32)
    # LayerNorm input cotangent
    m1 = jnp.mean(du, axis=-1, keepdims=True)
    m2 = jnp.mean(du * u, axis=-1, keepdims=True)
    dh = rsig * (du - m1 - u * m2)

    db = jnp.sum(dh, axis=tuple(range(dh.ndim - 1)))
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, K).astype(f32)
    dh2 = dh.reshape(m, N)
    dw = jnp.matmul(x2.T, dh2, preferred_element_type=f32)
    dx = jnp.matmul(dh2, w.astype(f32).T, preferred_element_type=f32)
    dx = dx.reshape(*lead, K)

    # residual-shortcut path
    if K == N:
        dx = dx + gy
    else:
        _, pool_vjp = jax.vjp(lambda xx: adaptive_avg_pool1d(xx, N).astype(f32), x)
        dx = dx + pool_vjp(gy)[0]

    return (dx.astype(x.dtype), dw.astype(w.dtype), db.astype(w.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype))


fused_spectre_linear.defvjp(_fwd, _bwd)
