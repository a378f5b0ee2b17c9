"""Fused multi-head attention kernel for the baseline ViT.

Replaces cuDNN SDPA inside torch ``nn.TransformerEncoder`` (reference
vit.py:30-38). At this model family's scale (seq = N+1 <= 65 tokens) the whole
attention matrix for one (batch, head) fits trivially in VMEM, so a flash-
style streaming softmax would only add overhead: the right TPU kernel is one
program per (batch, head) that keeps QK^T, the softmax and PV in registers/
VMEM end-to-end — zero HBM traffic for the [N, N] intermediate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectre_tpu.ops.pallas.common import use_interpret


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[:].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.float32)
    k = k_ref[:].reshape(k_ref.shape[-2], k_ref.shape[-1]).astype(jnp.float32)
    v = v_ref[:].reshape(v_ref.shape[-2], v_ref.shape[-1]).astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [N, N] = q @ k^T
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[:] = o.reshape(o_ref.shape).astype(o_ref.dtype)


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
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(B, H),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Softmax attention over [B, H, N, D] q/k/v -> [B, H, N, D].

    Custom VJP: forward via the fused kernel, backward via the VJP of the
    einsum reference (at seq <= 65 the recomputed [N, N] score matrix is
    noise-level FLOPs; XLA fuses the backward fine)."""
    return _forward(q, k, v, interpret)


def _fwd(q, k, v, interpret):
    return _forward(q, k, v, interpret), (q, k, v)


def _bwd(interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_reference, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
