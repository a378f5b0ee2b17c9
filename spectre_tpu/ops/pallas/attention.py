"""Fused multi-head attention kernel for the baseline ViT.

Replaces cuDNN SDPA inside torch ``nn.TransformerEncoder`` (reference
vit.py:30-38). At this model family's scale (seq = N+1 <= 65 tokens) the whole
attention matrix for one (batch, head) fits trivially in VMEM, so a flash-
style streaming softmax would only add overhead: the right TPU kernel is one
program per (batch, head) that keeps QK^T, the softmax and PV in registers/
VMEM end-to-end — zero HBM traffic for the [N, N] intermediate.

Backward: the standard flash backward in a second fused kernel. The forward
saves the per-row softmax statistics (LSE = m + log sum exp(s - m), an [N]
vector per (batch, head) — negligible HBM) so the backward reconstructs
P = exp(S - LSE) with ONE matmul and no second max/sum reduction pass, then
applies the rowsum trick (delta = rowsum(dO * O), dS = P * (dP - delta)) to
get dQ/dK/dV — five matmuls total, all in VMEM, and the [N, N] matrices
never touch HBM in either direction. No forward recompute: the einsum
reference below exists only as the parity oracle for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectre_tpu.ops.pallas.common import use_interpret


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    q = q_ref[:].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.float32)
    k = k_ref[:].reshape(k_ref.shape[-2], k_ref.shape[-1]).astype(jnp.float32)
    v = v_ref[:].reshape(v_ref.shape[-2], v_ref.shape[-1]).astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [N, N] = q @ k^T
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(e / l, v, preferred_element_type=jnp.float32)
    o_ref[:] = o.reshape(o_ref.shape).astype(o_ref.dtype)
    # softmax statistics for the backward: log-sum-exp per query row
    lse_ref[:] = (m + jnp.log(l)).reshape(lse_ref.shape)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    n, d = q_ref.shape[-2], q_ref.shape[-1]
    q = q_ref[:].reshape(n, d).astype(jnp.float32)
    k = k_ref[:].reshape(n, d).astype(jnp.float32)
    v = v_ref[:].reshape(n, d).astype(jnp.float32)
    o = o_ref[:].reshape(n, d).astype(jnp.float32)
    g = g_ref[:].reshape(n, d).astype(jnp.float32)
    lse = lse_ref[:].reshape(n, 1)

    # P from saved statistics: one matmul, no max/sum re-reduction
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)  # [N, N], rows already normalized

    # rowsum trick: delta_i = sum_d dO_id O_id  (= sum_j P_ij dP_ij)
    delta = jnp.sum(g * o, axis=-1, keepdims=True)  # [N, 1]
    dv = jax.lax.dot_general(  # P^T @ dO
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(  # dO @ V^T
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)  # softmax jacobian applied via the rowsum trick
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(  # dS^T @ Q
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    dq_ref[:] = dq.reshape(dq_ref.shape).astype(dq_ref.dtype)
    dk_ref[:] = dk.reshape(dk_ref.shape).astype(dk_ref.dtype)
    dv_ref[:] = dv.reshape(dv_ref.shape).astype(dv_ref.dtype)


def _reference(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d ** -0.5)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)


def _forward(q, k, v, interpret):
    interpret = use_interpret() if interpret is None else interpret
    B, H, N, D = q.shape
    scale = D ** -0.5

    spec = pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, N, 1), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(B, H),
        in_specs=[spec, spec, spec],
        out_specs=(spec, lse_spec),
        out_shape=(jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
                   jax.ShapeDtypeStruct((B, H, N, 1), jnp.float32)),
        interpret=interpret,
    )(q, k, v)


def _backward(q, k, v, o, lse, g, interpret):
    interpret = use_interpret() if interpret is None else interpret
    B, H, N, D = q.shape
    scale = D ** -0.5

    spec = pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, N, 1), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(B, H),
        in_specs=[spec, spec, spec, spec, lse_spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
                   jax.ShapeDtypeStruct((B, H, N, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, N, D), v.dtype)),
        interpret=interpret,
    )(q, k, v, o, lse, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Softmax attention over [B, H, N, D] q/k/v -> [B, H, N, D].

    Custom VJP: forward and backward are both fused Pallas kernels; the
    forward saves O and the per-row LSE so the backward reconstructs the
    probability matrix with one matmul (no forward recompute, no [N, N]
    HBM traffic in either pass)."""
    out, _ = _forward(q, k, v, interpret)
    return out


def _fwd(q, k, v, interpret):
    out, lse = _forward(q, k, v, interpret)
    return out, (q, k, v, out, lse)


def _bwd(interpret, res, g):
    q, k, v, o, lse = res
    return _backward(q, k, v, o, lse, g, interpret)


flash_attention.defvjp(_fwd, _bwd)
