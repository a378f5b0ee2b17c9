"""Fused 3-stage Clos-routed inverse-permutation gather-sum (Pallas TPU).

Computes the folded-mix backward ``dxt[j] = sum_h g[h*d + inv[h, j]]``
without ANY sub-tile row access. The per-head route tables (ops/routing.py,
host-side Euler-split edge colouring) factor each inverse permutation into

    stage A (within-row)   out1[q, t] = g[q, a_idx[q, t]]
    stage B (cross-row)    out2[q, t] = out1[b_idx[q, t], t]
    stage C (within-row)   y[q, s]    = out2[q, c_idx[q, s]]

over the [r, c] view of the d rows. Each stage is a batched ONE-HOT
contraction on the MXU — dense [c,c] / [r,r] matmuls over contiguous
tiles — so the (8,128) HBM tiling penalty that pins the XLA gather at
~11 ms/layer (8x read amplification; see ops/pallas/bwd_gather.py) never
applies: ``g`` streams through VMEM exactly once, sequentially.

One-hot matmuls pass values through bit-exactly (1.0*v + zeros, f32
accumulate — Mosaic requires 32-bit matmul accumulators — then an exact
downcast), so all stages preserve the input values; the head accumulation
into the output block is a bf16 add chain in grid order, bitwise-matching
the per-head XLA formulation (fused_mix._bwd_rows).

The one-hot stage operators are NOT materialized in HBM: the kernel
rebuilds them per grid step on the VPU from the [r, c] int32 index tables.
Stage B's [c, r, r] operator is the big one (17 MB bf16 at the flagship
260x128 factorization), so stages B+C run over STATIC t-chunks — stage C
is a contraction over t, so it accumulates per chunk into an f32 carry —
keeping peak VMEM under the 128 MB budget (block_b=128 measured 153.7 MB
without chunking).

Mosaic lowering constraints found building this (v5e, 2026-08):
- dot_general batch dims must sit at the SAME leading positions in both
  operands ("batch dims must be equal") — hence the jnp.swapaxes relayouts
  instead of general dimension_numbers;
- the lhs needs at least one non-contracting dim (pure matvecs fail);
- block shapes need the last two dims divisible by (8, 128) — block_b
  cannot drop below 128 to save VMEM.

Grid: (B-blocks, H) with heads fastest, so each output block stays
resident in VMEM across the 16 head contributions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectre_tpu.ops.pallas.common import use_interpret
from spectre_tpu.ops.routing import RouteTables


def _kernel(a_ref, b_ref, c_ref, g_ref, o_ref, *, r: int, c: int,
            t_chunk: int):
    ih = pl.program_id(1)
    dt = o_ref.dtype
    f32 = jnp.float32
    gv = g_ref[0].reshape(r, c, g_ref.shape[-1])

    def onehot(idx, n):  # [.., m] int32 -> [.., m, n] one-hot in data dtype
        return (idx[..., None]
                == lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)).astype(dt)

    bt = jnp.swapaxes(b_ref[0], 0, 1)  # [t, q'] int32

    # All three stages per static t-chunk: nothing full-size but the f32
    # accumulator is ever live (full-c staging measured 141-154 MB VMEM,
    # over the 128 MB budget; chunked peaks well under it).
    y = jnp.zeros((r, c, gv.shape[-1]), f32)
    for t0 in range(0, c, t_chunk):
        # stage A, batched over q, this chunk's colours only:
        # [q, tc, s] . [q, s, b] -> [q, tc, b]
        oh_a = onehot(a_ref[0][:, t0:t0 + t_chunk], c)
        out1 = lax.dot_general(oh_a, gv, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=f32).astype(dt)
        out1_t = jnp.swapaxes(out1, 0, 1)  # [tc, p, b]
        oh_b = onehot(bt[t0:t0 + t_chunk], r)  # [tc, q', p]
        out2_t = lax.dot_general(oh_b, out1_t,
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=f32).astype(dt)
        out2 = jnp.swapaxes(out2_t, 0, 1)  # [q, tc, b]
        # oh_c chunk [q, s, tc]: one-hot of c_idx restricted to this chunk
        oh_c = ((c_ref[0][:, :, None] - t0)
                == lax.broadcasted_iota(jnp.int32, (1, 1, t_chunk),
                                        2)).astype(dt)
        y = y + lax.dot_general(oh_c, out2, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=f32)
    y2 = y.astype(dt).reshape(r * c, -1)

    @pl.when(ih == 0)
    def _():
        o_ref[...] = y2

    @pl.when(ih > 0)
    def _():
        o_ref[...] = o_ref[...] + y2


def routed_gather_sum_pallas(
    g: jnp.ndarray,
    rt: RouteTables,
    block_b: int = 128,
    t_chunk: int = 32,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """dxt = sum_h route_h(g_h) for g [H*d, B] -> [d, B].

    ``rt`` must be host-built from the SAME inverse permutations the
    gather formulation would use (ops/routing.py::build_route_tables);
    tests pin bitwise agreement with fused_mix._bwd_rows' math.
    """
    interpret = use_interpret() if interpret is None else interpret
    h, r, c = rt.a_idx.shape
    d = r * c
    b = g.shape[-1]
    assert g.shape[0] == h * d, (g.shape, rt.a_idx.shape)
    while b % block_b:
        block_b //= 2
    t_chunk = min(t_chunk, c)
    while c % t_chunk:
        t_chunk //= 2
    grid = (b // block_b, h)
    return pl.pallas_call(
        functools.partial(_kernel, r=r, c=c, t_chunk=t_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, c), lambda ib, ih: (ih, 0, 0)),
            pl.BlockSpec((1, r, c), lambda ib, ih: (ih, 0, 0)),
            pl.BlockSpec((1, r, c), lambda ib, ih: (ih, 0, 0)),
            pl.BlockSpec((1, d, block_b), lambda ib, ih: (ih, 0, ib)),
        ],
        out_specs=pl.BlockSpec((d, block_b), lambda ib, ih: (0, ib)),
        out_shape=jax.ShapeDtypeStruct((d, b), g.dtype),
        # the f32 accumulator + double-buffered [d, block_b] in/out blocks
        # need ~80 MB at the flagship 260x128 factorization — over Mosaic's
        # 16 MB default scoped-vmem budget, comfortably inside v5e's 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(rt.a_idx), jnp.asarray(rt.b_idx), jnp.asarray(rt.c_idx),
      g.reshape(h, d, b))
