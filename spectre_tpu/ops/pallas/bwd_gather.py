"""Scalar-prefetch inverse-permutation row gather (the mix-backward hot op).

The folded mix's backward is ``dxt[j] = sum_h g[h*d + inv[h, j]]`` over the
[H*d, B] cotangent stream — the single largest remaining cost in the flagship
train step (~11 ms/layer x 4 at B=1024; BASELINE.md). XLA lowers it as H
per-head gathers (ops/fused_mix.py::_bwd_rows). SURVEY.md §7 named a
scalar-prefetch Pallas gather "the right answer"; VERDICT r2 #4 demanded the
question be settled with a kernel and a measurement rather than the
"near the hardware floor" prediction. This is that kernel — and building it
surfaced the ARCHITECTURAL reason the XLA gather sits at ~105 GB/s:

**TPU HBM arrays are (8, 128)-tiled.** A logical [1, B] bf16 row of a
[H*d, B] array is NOT 2 KB contiguous in HBM — it is 8 (B/128) scattered
256-byte tile-row segments. Mosaic rejects a single-row DMA at a dynamic
offset outright ("cannot statically prove that index in dimension 0 is a
multiple of 8" / tpu.memref_slice on the HBM ref), because sub-tile slices
of a tiled memref do not exist as memrefs. The only expressible random-row
DMA fetches the ALIGNED 8-ROW TILE BLOCK containing the target row — an 8x
read amplification (1.09 GB logical -> 8.7 GB physical), which is also
exactly what the memory system does for ANY engine reading one logical row.
"Random 2 KB rows at ~100 GB/s" (BASELINE.md r2) is therefore not an XLA
artifact but the tiled-layout floor: ~8x under streaming bandwidth.

The kernel below implements that aligned-block variant: per output row and
head, DMA the 8-row aligned block (double-buffered in groups of 8 output
rows), select the target row on the VPU via a one-hot mask built from the
prefetched remainders, and head-sum. Its measured number
(benchmarks/bwd_gather_variants.py --pallas) is recorded in BASELINE.md
next to the XLA per-head chain it tried to beat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectre_tpu.ops.pallas.common import use_interpret

_GROUP = 8  # output rows per inner step (Mosaic stores need 8-aligned dim 0)
_TILE = 8   # HBM sublane tile: the DMA-addressable row granularity


def _kernel(al_ref, g_hbm, mask_ref, o_ref, stage, sems, *,
            rows: int, heads: int):
    """``rows`` output rows in groups of 8. Per group: 8*heads aligned
    8-row-block DMAs into staging (double-buffered), then row selection +
    head-sum as ONE batched matvec against the host-built one-hot mask
    (a [G, K] x [G, K, B] dot_general — Mosaic has no 3D boolean reshape
    or dynamic sublane select, but batched MXU contractions are native),
    one aligned [8, B] store."""
    n_groups = rows // _GROUP

    def fetch(slot, grp):
        base = grp * _GROUP
        for j in range(_GROUP):
            for h2 in range(heads):
                al = pl.multiple_of(al_ref[base + j, h2], _TILE)
                pltpu.make_async_copy(
                    g_hbm.at[pl.ds(al, _TILE), :],
                    stage.at[slot, pl.ds((j * heads + h2) * _TILE, _TILE), :],
                    sems.at[slot, j * heads + h2],
                ).start()

    def wait(slot):
        for i in range(_GROUP * heads):
            pltpu.make_async_copy(
                g_hbm.at[pl.ds(0, _TILE), :],
                stage.at[slot, pl.ds(i * _TILE, _TILE), :],
                sems.at[slot, i],
            ).wait()

    fetch(0, 0)
    k = heads * _TILE

    def body(grp, _):
        slot = jax.lax.rem(grp, 2)

        @pl.when(grp + 1 < n_groups)
        def _():
            fetch(1 - slot, grp + 1)

        wait(slot)
        blk = stage[slot].reshape(_GROUP, k, -1).astype(jnp.float32)
        off = pl.multiple_of(grp * _GROUP, _GROUP)
        mask = mask_ref[pl.ds(off, _GROUP), :]  # [G, K] one-hot-per-head
        acc = jax.lax.dot_general(  # batched over G: [1, K] . [K, B] -> [1, B]
            mask[:, None, :], blk, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # Mosaic needs a (here
        # size-1) lhs non-contracting dim — a pure matvec fails to lower
        o_ref[pl.ds(off, _GROUP), :] = acc.reshape(mask.shape[0],
                                                   -1).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0, unroll=False)


def inverse_gather_sum_pallas(
    g: jnp.ndarray,
    inv: jnp.ndarray,
    rows_per_program: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """dxt[j, :] = sum_h g[h*d + inv[h, j], :] for g [H*d, B], inv [H, d].

    Matches ops/fused_mix.py::_bwd_rows' math (the backward of the
    token-major multi-head row gather). Not differentiated through — it IS
    a backward. See the module docstring for why the fetch is 8x amplified.
    """
    interpret = use_interpret() if interpret is None else interpret
    h, d = inv.shape
    b = g.shape[-1]
    if d % _GROUP or g.shape[0] % _TILE:
        # aligned-store/fetch requirement; sub-8 shapes are toy sizes
        return inverse_gather_sum_reference(g, inv)
    r = min(rows_per_program, d)
    while r >= _GROUP and (d % r or r % _GROUP):
        r //= 2
    if r < _GROUP:  # non-pow2 request can halve past every valid size
        r = _GROUP  # d % _GROUP == 0 is guaranteed by the guard above
    # per-output-row source rows, head-minor: row j, head h2 -> h2*d+inv
    idx = (inv + (jnp.arange(h, dtype=inv.dtype) * d)[:, None]).T  # [d, H]
    al = (idx // _TILE) * _TILE   # aligned DMA starts
    rem = idx - al                # row-in-block remainders
    # host-built selection mask: mask[j, h2*T + t] = (t == rem[j, h2]);
    # the kernel contracts it against the staged blocks on the MXU
    mask = (rem[:, :, None]
            == jnp.arange(_TILE, dtype=rem.dtype)).reshape(d, h * _TILE)
    mask = mask.astype(jnp.float32)

    grid = (d // r,)
    return pl.pallas_call(
        functools.partial(_kernel, rows=r, heads=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, h), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # g stays in HBM
            pl.BlockSpec((r, h * _TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, b), g.dtype),
        scratch_shapes=[
            # double-buffered staging: 8-row block per (row-in-group, head)
            pltpu.VMEM((2, _GROUP * h * _TILE, b), g.dtype),
            pltpu.SemaphoreType.DMA((2, _GROUP * h)),
        ],
        interpret=interpret,
    )(al, g, mask)


def _blk_kernel(starts_ref, g_hbm, o_ref, stage, acc, sems, *,
                heads: int, blk: int, hc: int, full_table: bool):
    """Output BLOCKS (blk rows) via a flat pipelined loop over
    (block, head-chunk) steps: each step DMAs ``hc`` aligned [blk, B]
    source blocks into staging (double-buffered across steps), head-sums
    them into an f32 accumulator, and stores once per output block. Unlike
    `_kernel` above, every fetched row is WANTED — a block-structured
    permutation has no tile read amplification, so the kernel moves the
    minimal 1x traffic where the row-gather moves 8x.

    ``hc`` bounds staging VMEM (2*hc*blk*B elems) — for large blk the heads
    are consumed in ceil(H/hc) chunks. ``starts_ref`` is either the
    per-program [r/blk, H] slice (relative indexing) or — when r/blk breaks
    Mosaic's 8-sublane block rule but the whole table fits SMEM — the FULL
    [nb_total, H] table, indexed absolutely (``full_table``)."""
    nb = o_ref.shape[0] // blk
    nchunks = (heads + hc - 1) // hc
    base_blk = pl.program_id(0) * nb if full_table else 0
    n_steps = nb * nchunks

    def fetch(slot, step):
        jb = step // nchunks
        h0 = (step % nchunks) * hc
        for i in range(hc):
            h2 = jnp.minimum(h0 + i, heads - 1)  # tail chunk: dup fetch ok
            src = pl.multiple_of(starts_ref[base_blk + jb, h2], _TILE)
            pltpu.make_async_copy(
                g_hbm.at[pl.ds(src, blk), :],
                stage.at[slot, pl.ds(i * blk, blk), :],
                sems.at[slot, i],
            ).start()

    def wait(slot):
        for i in range(hc):
            pltpu.make_async_copy(
                g_hbm.at[pl.ds(0, blk), :],
                stage.at[slot, pl.ds(i * blk, blk), :],
                sems.at[slot, i],
            ).wait()

    fetch(0, 0)

    def body(step, _):
        slot = jax.lax.rem(step, 2)
        jb = step // nchunks
        c = step % nchunks

        @pl.when(step + 1 < n_steps)
        def _():
            fetch(1 - slot, step + 1)

        wait(slot)
        h0 = c * hc
        blks = stage[slot].reshape(hc, blk, -1).astype(jnp.float32)
        part = blks[0]
        for i in range(1, hc):
            live = h0 + i < heads  # mask the tail chunk's duplicate fetches
            part = part + jnp.where(live, blks[i], 0.0)

        @pl.when(c == 0)
        def _():
            acc[...] = part

        @pl.when(c != 0)
        def _():
            acc[...] = acc[...] + part

        @pl.when(c == nchunks - 1)
        def _():
            off = pl.multiple_of(jb * blk, _GROUP)
            o_ref[pl.ds(off, blk), :] = acc[...].astype(o_ref.dtype)

        return 0

    jax.lax.fori_loop(0, n_steps, body, 0, unroll=False)


def block_gather_sum_pallas(
    g: jnp.ndarray,
    binv: jnp.ndarray,
    blk: int,
    rows_per_program: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """dxt[jb*blk + t] = sum_h g[h*d + binv[h, jb]*blk + t] — the mix
    backward for a BLOCK-structured permutation (rows move in whole blk-row
    blocks; binv [H, d/blk] holds the block-level inverse perms).

    The row-gather kernels above are pinned at ~1/8 of stream bandwidth by
    the (8,128) HBM tiling (every 2 KB logical row costs an 8-row tile
    block). When the permutation is block-structured with blk >= 8, the
    8-row fetch IS the payload: this kernel DMAs [blk, B] source blocks
    directly and head-sums them, moving minimal traffic. This is the
    TPU-first `mix_block` variant's backward (models/layers.py) — opt-in,
    because it narrows the permutation distribution the reference samples
    uniformly (layers.py:61-65); convergence parity is checked separately.
    """
    interpret = use_interpret() if interpret is None else interpret
    h, nb = binv.shape
    d = nb * blk
    b = g.shape[-1]
    assert blk % _TILE == 0 and g.shape[0] == h * d, (blk, g.shape, h, d)
    # rows/program: the largest whole-block divisor of d under the cap —
    # halving can dead-end for non-power-of-two blk (e.g. d=480, blk=24)
    nb_total = d // blk
    r = blk * max([m for m in range(1, nb_total + 1)
                   if nb_total % m == 0 and m * blk <= rows_per_program],
                  default=1)  # blk > cap: one block per program
    starts = (binv * blk
              + (jnp.arange(h, dtype=binv.dtype) * d)[:, None]).T  # [nb, H]

    # Mosaic SMEM blocks need an 8-divisible sublane count; when r/blk < 8
    # (large blocks) ship the whole (now small) table and index absolutely.
    full_table = (r // blk) % _TILE != 0
    table_spec = (pl.BlockSpec(memory_space=pltpu.SMEM) if full_table else
                  pl.BlockSpec((r // blk, h), lambda i: (i, 0),
                               memory_space=pltpu.SMEM))
    # head-chunk size: cap double-buffered staging at ~8 MB of VMEM
    stage_budget = 8 * 2**20
    hc = max(1, min(h, stage_budget // (2 * blk * b * g.dtype.itemsize)))
    grid = (d // r,)
    return pl.pallas_call(
        functools.partial(_blk_kernel, heads=h, blk=blk, hc=hc,
                          full_table=full_table),
        grid=grid,
        in_specs=[
            table_spec,
            pl.BlockSpec(memory_space=pl.ANY),   # g stays in HBM
        ],
        out_specs=pl.BlockSpec((r, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, b), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, hc * blk, b), g.dtype),
            pltpu.VMEM((blk, b), jnp.float32),
            pltpu.SemaphoreType.DMA((2, hc)),
        ],
        interpret=interpret,
    )(starts, g)


def _fwd_blk_kernel(starts_ref, x_ref, o_ref, *, blk: int, bpp: int):
    """FORWARD block scatter: ``bpp`` output blocks per program, each a
    [blk, B] copy out of the VMEM-RESIDENT source. ``x_ref`` maps the whole
    [d, B] source with a constant index map — the pipeline fetches it into
    VMEM once (same block every step => no re-DMA), so the source's HBM
    read happens exactly once (65 MiB at flagship) instead of once per
    output row; the kernel is then purely write-bound."""
    pid = pl.program_id(0)
    for k in range(bpp):
        s = pl.multiple_of(starts_ref[pid * bpp + k], _TILE)
        o_ref[pl.ds(k * blk, blk), :] = x_ref[pl.ds(s, blk), :]


def block_scatter_rows_pallas(
    xt: jnp.ndarray,
    bsrc: jnp.ndarray,
    blk: int,
    rows_per_program: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """out[h*d + jb*blk + t] = xt[bsrc[h, jb]*blk + t] — the mix FORWARD for
    a block-structured permutation ([d, B] -> [H*d, B]; bsrc [H, d/blk]
    holds the block-level source indices perms[:, ::blk] // blk).

    Matches ``perm_rows_t`` / ``perm_rows_t_keyed``'s primal on block
    tables. Rationale (measured, benchmarks/fwd_gather_variants.py): XLA's
    flat row take already runs this forward at ~534 GiB/s effective — the
    65 MiB source is small enough that its amplified tile re-reads stay off
    the critical path — so unlike the backward there is no 8x cliff to fix;
    the win here is keeping the source VMEM-resident so the only HBM
    traffic is the 1.02 GiB output write stream."""
    interpret = use_interpret() if interpret is None else interpret
    h, nb = bsrc.shape
    d = nb * blk
    b = xt.shape[-1]
    assert blk % _TILE == 0 and xt.shape[0] == d, (blk, xt.shape, h, d)
    # VMEM residency guard: source + double-buffered output block must fit
    if xt.nbytes > 100 * 2**20:
        return jnp.take(xt.reshape(nb, blk * b), bsrc.reshape(-1), axis=0,
                        mode="clip").reshape(h * d, b)
    nb_total = h * nb
    bpp = max([m for m in range(1, nb_total + 1)
               if nb_total % m == 0 and m * blk <= rows_per_program],
              default=1)
    r = bpp * blk
    starts = (bsrc * blk).reshape(-1)  # [h*nb] absolute source row starts
    return pl.pallas_call(
        functools.partial(_fwd_blk_kernel, blk=blk, bpp=bpp),
        grid=(nb_total // bpp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full table, absolute idx
            pl.BlockSpec((d, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # resident source
        ],
        out_specs=pl.BlockSpec((r, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h * d, b), xt.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(xt.nbytes + 4 * r * b
                                     * xt.dtype.itemsize) + 2**20,
                                 120 * 2**20)),
        interpret=interpret,
    )(starts, xt)


def _fused_bwd_kernel(ns_ref, e0_ref, dy_ref, w_ref, sg_ref, o_ref, acc,
                      *, heads: int, blk: int):
    """One output block per grid step: acc[blk, Bc] = sum_h sign ⊙
    (w[e0_h : e0_h+blk, :] @ dy[n_h]^T) — the mix backward's dmixed GEMM
    and inverse block-gather fused, so the [H·d, B] dmixed cotangent never
    exists in HBM. dy (the projection cotangent chunk) and w are
    VMEM-RESIDENT (constant index maps); the per-(block, head) source
    coordinates (token n, w-row offset e0) and pre-gathered signs arrive as
    tables. All operands are on-chip, so each step is 16 pure-MXU
    [blk, O] x [Bc, O] contractions."""
    j = pl.program_id(1)
    acc[...] = jnp.zeros_like(acc)
    for h2 in range(heads):
        n = ns_ref[j, h2]
        e0 = pl.multiple_of(e0_ref[j, h2], blk)
        wb = w_ref[pl.ds(e0, blk), :]
        dyn = dy_ref[n]
        part = jax.lax.dot_general(
            wb, dyn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc[...] += sg_ref[0, h2].astype(jnp.float32)[:, None] * part
    o_ref[...] = acc[...].astype(o_ref.dtype)


def fused_block_bwd_pallas(
    dy: jnp.ndarray,
    w: jnp.ndarray,
    s4: jnp.ndarray,
    binv: jnp.ndarray,
    blk: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """dxt[j*blk+t, b] = Σ_h s4f[r] · Σ_o dy[n_r, b, o] · w[e_r, o] with
    r = h·d + binv[h, j]·blk + t, n_r = r // EH, e_r = r % EH — i.e.
    ``block_gather_sum(s4 ⊙ (dy @ w^T))`` WITHOUT materializing the
    [H·d, B] intermediate (1.02 GiB written + re-read at flagship shape).

    Requirements (flagship: d=33280, EH=8192, blk=64, N=65, O=512): blk
    divides EH (so a source block never straddles a token boundary — holds
    whenever blk divides the per-head embed width E, which the block-table
    sampler guarantees), and dy/w stay under the VMEM residency budget (the
    batch is chunked to keep the dy chunk ~<=36 MB).
    """
    interpret = use_interpret() if interpret is None else interpret
    h, nb = binv.shape
    d = nb * blk
    n_tok, b, o = dy.shape
    eh = w.shape[0]
    assert eh * n_tok == h * d and eh % blk == 0, (dy.shape, w.shape, binv.shape)
    start = (binv * blk
             + (jnp.arange(h, dtype=binv.dtype) * d)[:, None]).T  # [nb, H]
    ns = (start // eh).astype(jnp.int32)
    e0 = (start % eh).astype(jnp.int32)
    sflat = s4.reshape(-1)
    sg = sflat[start[:, :, None]
               + jnp.arange(blk, dtype=start.dtype)]  # [nb, H, blk]
    # batch chunk: largest divisor of b whose dy chunk fits the budget
    budget = 36 * 2**20
    bc = b
    while bc > 128 and n_tok * bc * o * dy.dtype.itemsize > budget:
        if b % (bc // 2):
            break
        bc //= 2
    grid = (b // bc, nb)
    return pl.pallas_call(
        functools.partial(_fused_bwd_kernel, heads=h, blk=blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ns, full table
            pl.BlockSpec(memory_space=pltpu.SMEM),  # e0, full table
            pl.BlockSpec((n_tok, bc, o), lambda c, j: (0, c, 0),
                         memory_space=pltpu.VMEM),  # dy chunk, resident per c
            pl.BlockSpec((eh, o), lambda c, j: (0, 0),
                         memory_space=pltpu.VMEM),  # w, resident
            pl.BlockSpec((1, h, blk), lambda c, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),  # pre-gathered signs
        ],
        out_specs=pl.BlockSpec((blk, bc), lambda c, j: (j, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, b), dy.dtype),
        scratch_shapes=[pltpu.VMEM((blk, bc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # the pipeline double-buffers even the constant-index dy chunk
            # across the (rare) c-boundary prefetch, so budget 2x
            vmem_limit_bytes=min(
                int(2 * n_tok * bc * o * dy.dtype.itemsize + 2 * w.nbytes
                    + 8 * blk * bc * 4) + 4 * 2**20,
                120 * 2**20)),
        interpret=interpret,
    )(ns, e0, dy, w, sg)


def fused_block_bwd_reference(dy, w, s4, binv, blk):
    """jnp oracle: the production two-op chain (dmixed einsum + block
    gather-sum) this kernel fuses."""
    h, nb = binv.shape
    n_tok = dy.shape[0]
    eh = w.shape[0]
    dg = s4[:, :, None] * jnp.einsum("nbo,eo->neb", dy, w)
    gflat = dg.reshape(n_tok * eh, -1)
    return block_gather_sum_reference(gflat, binv, blk)


def block_gather_sum_reference(g: jnp.ndarray, binv: jnp.ndarray,
                               blk: int) -> jnp.ndarray:
    """jnp oracle for the blocked backward (per-head block takes)."""
    h, nb = binv.shape
    gh = g.reshape(h, nb, -1)
    acc = jnp.take(gh[0], binv[0], axis=0, mode="clip")
    for i in range(1, h):
        acc = acc + jnp.take(gh[i], binv[i], axis=0, mode="clip")
    return acc.reshape(nb * blk, -1)


def inverse_gather_sum_reference(g: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """jnp oracle: the per-head chain production ships (fused_mix._bwd_rows)."""
    h, d = inv.shape
    gh = g.reshape(h, d, -1)
    acc = jnp.take(gh[0], inv[0], axis=0, mode="clip")
    for i in range(1, h):
        acc = acc + jnp.take(gh[i], inv[i], axis=0, mode="clip")
    return acc
