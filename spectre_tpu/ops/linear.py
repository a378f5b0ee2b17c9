"""Linear-layer building blocks with exact reference numerics.

- ``adaptive_avg_pool1d``: torch ``nn.AdaptiveAvgPool1d`` semantics over the
  last axis, expressed as a precomputed averaging *matrix* so it runs as a
  GEMM on the MXU instead of irregular segment reductions. Used by the
  SpectreLinear residual shortcut (reference layers.py:90-93).
- ``gelu_exact``: torch ``nn.GELU()`` default is the exact erf formulation;
  jax.nn.gelu defaults to tanh-approximate — parity requires approximate=False.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


@lru_cache(maxsize=None)
def _adaptive_pool_matrix_np(in_len: int, out_len: int) -> np.ndarray:
    """[in_len, out_len] matrix M with pool(x) = x @ M.

    torch AdaptiveAvgPool1d: out[i] = mean(x[floor(i*L/Lo) : ceil((i+1)*L/Lo)]).
    """
    m = np.zeros((in_len, out_len), dtype=np.float32)
    for i in range(out_len):
        start = (i * in_len) // out_len
        end = -((-(i + 1) * in_len) // out_len)  # ceil
        m[start:end, i] = 1.0 / (end - start)
    return m


def adaptive_pool_matrix(in_len: int, out_len: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_adaptive_pool_matrix_np(in_len, out_len), dtype=dtype)


def adaptive_avg_pool1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Pool the last axis of x to ``out_len`` with torch-adaptive semantics.

    MXU formulation: a [L, Lo] matmul; for L == Lo this is the identity and is
    short-circuited (matching the reference's identity shortcut,
    layers.py:90-93).
    """
    in_len = x.shape[-1]
    if in_len == out_len:
        return x
    if in_len % out_len == 0:
        # uniform windows: torch adaptive pool degenerates to a grouped mean —
        # a VPU reshape-reduce instead of an [L, Lo] matmul (the flagship's
        # E*H -> E residual would otherwise double the largest GEMM's FLOPs).
        # dtype=x.dtype keeps the reduce in the compute dtype: jnp.mean's
        # default f32 upcast materialized an f32 copy of the [B, H, d] mixed
        # tensor (2.18 GB, 6.7 ms/layer in the r2 profile); a 16-element bf16
        # mean loses < 1 ulp of a residual shortcut
        g = in_len // out_len
        return jnp.mean(x.reshape(*x.shape[:-1], out_len, g), axis=-1,
                        dtype=x.dtype)
    m = adaptive_pool_matrix(in_len, out_len, x.dtype)
    return jnp.matmul(x, m)


def layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis, torch eps=1e-5 (reference spectre.py:46)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


def spectre_linear_apply(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Functional core of SpectreLinear (reference layers.py:76-101):

        GELU(LayerNorm(x @ w + b)) + adaptive_avg_pool(x)

    w: [in, out]. The Linear+LN+GELU chain is a single fused epilogue for XLA;
    the Pallas fused kernel lives in ops/pallas/fused_linear.py.
    """
    h = jnp.matmul(x, w) + b
    h = layer_norm(h, gamma, beta, eps)
    h = gelu_exact(h)
    return h + adaptive_avg_pool1d(x, w.shape[-1])
