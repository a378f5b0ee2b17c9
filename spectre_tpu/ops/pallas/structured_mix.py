"""Tile-structured mixing kernel — the TPU-native "attention replacement".

The hottest op in the model family is MHPermutMix's gather+sign multiply
(SURVEY.md §3: touches H*N*E elements per layer). An arbitrary d-element
permutation is irregular memory traffic; this kernel implements the
structured factorization from ops/permute.py::make_structured_tables:

    per head h:  y_h = signs_h * (tile-permute_h(x) @ (I kron H_tile))

- the tile permutation costs ZERO compute: it is pure block routing, done by
  remapping each grid program's input lane-block index through the scalar-
  prefetched ``tile_perms`` table (PrefetchScalarGridSpec — indices land in
  SMEM before the body runs, so the DMA engine fetches the right tile);
- the intra-tile Hadamard is one [tile, tile] MXU matmul per block;
- the output-side sign flip is an XLA elementwise pass outside the kernel
  (Mosaic block rules make a per-(head, tile) vector operand awkward, and the
  multiply fuses with the downstream projection's input read anyway).

Everything stays 2D [rows, lanes] with (>=8, 128)-aligned blocks — the layout
Mosaic wants. Every HBM byte moves exactly once, in contiguous lane tiles.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectre_tpu.ops.pallas.common import cdiv, use_interpret
from spectre_tpu.ops.permute import hadamard_matrix

_TILE_B = 256


def pallas_path_taken(batch: int, d: int, n_tiles: int) -> bool:
    """True iff ``structured_mix_pallas`` will actually run the Mosaic kernel
    for these dimensions (rather than silently taking the jnp reference path
    for sub-tile shapes). Benchmark harnesses use this to LABEL fallback rows
    — a 'pallas' timing that secretly measured XLA is misleading."""
    t = d // n_tiles
    return not (t % 128 or batch % 8)


def _kernel(perm_ref, x_ref, h_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], h_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _forward(x, tile_perms, signs, token_dim, interpret):
    interpret = use_interpret() if interpret is None else interpret
    B = x.shape[0]
    x2 = x.reshape(B, -1)
    d = x2.shape[-1]
    H, n_tiles = tile_perms.shape
    t = d // n_tiles
    if not interpret and not pallas_path_taken(B, d, n_tiles):
        # Mosaic block rule: last two block dims must be (8, 128)-aligned.
        # Sub-tile shapes (small models/studies) take the jnp reference —
        # identical math, and XLA handles small shapes fine anyway.
        from spectre_tpu.ops.permute import structured_mix

        return structured_mix(x, tile_perms, signs, token_dim)
    had = hadamard_matrix(t, x.dtype)

    tile_b = min(_TILE_B, max(8, B))
    grid = (cdiv(B, tile_b), H, n_tiles)

    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # input lane-block routed through the prefetched permutation
                pl.BlockSpec((tile_b, t), lambda i, h, j, perm: (i, perm[h, j]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, t), lambda i, h, j, perm: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_b, t),
                lambda i, h, j, perm, _T=n_tiles: (i, h * _T + j),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H * d), x.dtype),
        interpret=interpret,
    )(tile_perms, x2, had)
    out = out * signs.reshape(1, H * d).astype(out.dtype)
    return out.reshape(B, token_dim, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def structured_mix_pallas(
    x: jnp.ndarray,
    tile_perms: jnp.ndarray,
    signs: jnp.ndarray,
    token_dim: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Same contract as ops.permute.structured_mix: x [B, N, E] (or [B, d]),
    tile_perms [H, T] int32, signs [1, H, d] -> [B, token_dim, d*H/token_dim].

    Custom VJP: the kernel runs the forward; the backward is the analytic
    transpose of the (linear) op — signs multiply, transposed Hadamard
    matmul, gather by the INVERSE tile permutation, head-sum. No forward
    recompute and no scatter (round-1 called jax.vjp of the jnp reference,
    re-running the forward inside the backward). Table cotangents are zero
    (fixed buffers) but defined so the op composes under any transform."""
    return _forward(x, tile_perms, signs, token_dim, interpret)


def _fwd(x, tile_perms, signs, token_dim, interpret):
    return _forward(x, tile_perms, signs, token_dim, interpret), (x, tile_perms, signs)


def _bwd(token_dim, interpret, res, g):
    x, tile_perms, signs = res
    B = x.shape[0]
    d = int(np.prod(x.shape[1:]))
    H, n_tiles = tile_perms.shape
    t = d // n_tiles

    gs = g.reshape(B, H, n_tiles, t) * signs.reshape(1, H, n_tiles, t)
    had = hadamard_matrix(t, gs.dtype)
    dgathered = jnp.einsum("bhns,ts->bhnt", gs, had)  # H_t is symmetric; kept explicit
    inv = jnp.argsort(tile_perms, axis=-1)  # inverse tile permutations
    dxt = jnp.take_along_axis(dgathered, inv[None, :, :, None], axis=2).sum(axis=1)
    return (dxt.reshape(x.shape),
            np.zeros(tile_perms.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(signs))


structured_mix_pallas.defvjp(_fwd, _bwd)
