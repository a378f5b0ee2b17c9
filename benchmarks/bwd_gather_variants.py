"""Backward inverse-gather formulations for the folded mix, microbenched.

The folded-mix backward is dxt[j] = sum_h g[h*d + inv[h, j]] with g the
[H*d, B] cotangent stream (1.09 GB bf16 at the flagship config). The flat
single-take formulation reads 2 KB rows randomly across the whole 1.09 GB
footprint — this harness measures it at 12.7 ms standalone (~85 GiB/s
against the minimal read-stream+write-result traffic it prints; the
in-step schedule ran the same gather at 10.8 ms, plots/layer_folded.csv
fusion.1) — while the FORWARD flat gather reads randomly within a 68 MB
source far faster (benchmarks/mix_decompose.py). The hypothesis this
harness tests: the gap is source-footprint locality (HBM row-buffer hits),
so re-expressing the backward as H per-head gathers — each reading randomly
within one 68 MB head slice — plus one 16-way add should close it. Result:
per-head 11.0 ms vs flat 12.7 ms standalone, and a 27 ms/step win in the
composite train step; the per-head form shipped (ops/fused_mix.py
::_bwd_rows).

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/bwd_gather_variants.py
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.repl.perf import _time_fn


def make_tables(rng, h, d):
    perms = np.stack([rng.permutation(d) for _ in range(h)]).astype(np.int32)
    inv = np.argsort(perms, axis=-1).astype(np.int32)
    return jnp.asarray(perms), jnp.asarray(inv)


def flat(g, inv, h, d):
    """The formulation production used BEFORE the per-head rewrite
    (ops/fused_mix.py::_bwd_rows now ships the per_head variant below)."""
    offs = (jnp.arange(h, dtype=inv.dtype) * d)[:, None]
    idx = (inv + offs).T.reshape(-1)
    return jnp.take(g, idx, axis=0).reshape(d, h, -1).sum(axis=1)


def per_head(g, inv, h, d):
    """H small-footprint gathers (68 MB source each) + one n-ary add."""
    gh = g.reshape(h, d, -1)
    acc = jnp.take(gh[0], inv[0], axis=0)
    for i in range(1, h):
        acc = acc + jnp.take(gh[i], inv[i], axis=0)
    return acc


def per_head_stacked(g, inv, h, d):
    """vmap'd per-head take then one reduce (lets XLA schedule the adds)."""
    gh = g.reshape(h, d, -1)
    out = jax.vmap(lambda gg, ii: jnp.take(gg, ii, axis=0))(gh, inv)
    return out.sum(axis=0)


def blocked(g, binv, h, d, blk):
    """BLOCK-structured permutation: rows move in whole blk-row blocks
    (binv: [h, d/blk] block-level inverse perms), so every take reads a
    [blk*B]-contiguous row — full (8,128) HBM tiles instead of 1-of-8.
    The permutation DISTRIBUTION differs from uniform, so this row is
    comparable on traffic, not numerics."""
    gh = g.reshape(h, d // blk, -1)
    acc = jnp.take(gh[0], binv[0], axis=0)
    for i in range(1, h):
        acc = acc + jnp.take(gh[i], binv[i], axis=0)
    return acc.reshape(d, -1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--d", type=int, default=33280)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--pallas", action="store_true",
                   help="also time the scalar-prefetch double-buffered "
                        "row-DMA Pallas kernel (ops/pallas/bwd_gather.py)")
    p.add_argument("--rows", type=int, nargs="*", default=[64, 256, 1024],
                   help="rows-per-program sweep for --pallas")
    p.add_argument("--blocks", type=int, nargs="*", default=[],
                   help="block sizes for the block-structured permutation "
                        "row (rows move in whole blk-row blocks)")
    p.add_argument("--routed", action="store_true",
                   help="also time the 3-stage Clos routing formulation "
                        "(ops/routing.py: the permutation as batched one-hot "
                        "MXU contractions — no sub-tile row access at all)")
    p.add_argument("--skip-base", action="store_true",
                   help="skip the flat/per-head baseline rows (already in "
                        "BASELINE.md) — useful when sweeping --blocks only")
    args = p.parse_args(argv)
    from spectre_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # remote compiles here run minutes; cache them
    h, d, b = args.heads, args.d, args.batch
    rng = np.random.default_rng(0)
    _, inv = make_tables(rng, h, d)
    g = jnp.asarray(rng.standard_normal((h * d, b)), jnp.bfloat16)
    bytes_min = (g.nbytes + d * b * 2)  # read stream once + write result
    print(f"g [H*d={h*d}, B={b}] bf16 = {g.nbytes / 2**30:.2f} GiB; "
          f"minimal traffic {bytes_min / 2**30:.2f} GiB")
    base = [] if args.skip_base else [
        ("flat", flat), ("per_head", per_head),
        ("per_head_stacked", per_head_stacked)]
    for name, fn in base:
        f = jax.jit(functools.partial(fn, h=h, d=d))
        t = _time_fn(f, g, inv, iters=args.iters)
        print(f"  {name:18s}: {t * 1e3:7.3f} ms  "
              f"({bytes_min / t / 2**30:7.1f} GiB/s effective)")
    for blk in args.blocks:
        if d % blk:
            continue
        binv = jnp.asarray(
            np.stack([rng.permutation(d // blk) for _ in range(h)])
            .astype(np.int32))
        f = jax.jit(functools.partial(blocked, h=h, d=d, blk=blk))
        t = _time_fn(f, g, binv, iters=args.iters)
        print(f"  blocked blk={blk:<5d} : {t * 1e3:7.3f} ms  "
              f"({bytes_min / t / 2**30:7.1f} GiB/s effective)")
        # the Pallas block-DMA kernel: every fetched row is wanted (no
        # (8,128)-tile amplification) — the mix_block variant's backward
        from spectre_tpu.ops.pallas.bwd_gather import (
            block_gather_sum_pallas, block_gather_sum_reference)

        fp = jax.jit(functools.partial(block_gather_sum_pallas, blk=blk))
        # oracle in f32: the kernel accumulates heads in f32 and rounds the
        # OUTPUT once, while a bf16 jnp chain accumulates rounding per add
        # (measured max|diff| 0.25 at H=16 against a bf16 oracle — that was
        # oracle error, not kernel error)
        ref = np.asarray(block_gather_sum_reference(
            g.astype(jnp.float32), binv, blk), dtype=np.float32)
        got = np.asarray(fp(g, binv), dtype=np.float32)
        err = np.max(np.abs(got - ref))
        t = _time_fn(fp, g, binv, iters=args.iters)
        print(f"  blocked-pallas blk={blk:<5d}: {t * 1e3:7.3f} ms  "
              f"({bytes_min / t / 2**30:7.1f} GiB/s effective, "
              f"max|diff| {err:.3g})")
    if args.pallas:
        from spectre_tpu.ops.pallas.bwd_gather import (
            inverse_gather_sum_pallas, inverse_gather_sum_reference)

        ref = np.asarray(inverse_gather_sum_reference(g, inv),
                         dtype=np.float32)
        for r in args.rows:
            f = jax.jit(functools.partial(inverse_gather_sum_pallas,
                                          rows_per_program=r))
            got = np.asarray(f(g, inv), dtype=np.float32)
            # bf16 sum-order tolerance (kernel accumulates f32, XLA chain bf16)
            err = np.max(np.abs(got - ref))
            t = _time_fn(f, g, inv, iters=args.iters)
            print(f"  pallas r={r:<5d}     : {t * 1e3:7.3f} ms  "
                  f"({bytes_min / t / 2**30:7.1f} GiB/s effective, "
                  f"max|diff| {err:.3g})")
    if args.routed:
        import time

        from spectre_tpu.ops.routing import (build_route_tables,
                                             route_gather_sum,
                                             route_gather_sum_mxu,
                                             route_onehots)

        ref = np.asarray(per_head(g, inv, h=h, d=d), dtype=np.float32)
        t0 = time.perf_counter()
        rt = build_route_tables(np.asarray(inv))
        print(f"  route tables (host, one-time): {time.perf_counter() - t0:.1f} s "
              f"r={rt.r} c={rt.c}")
        oh = route_onehots(rt, dtype=g.dtype)
        masks_gib = sum(o.nbytes for o in oh) / 2**30
        f = jax.jit(route_gather_sum_mxu)
        got = np.asarray(f(g, *oh), dtype=np.float32)
        err = np.max(np.abs(got - ref))
        t = _time_fn(f, g, *oh, iters=args.iters)
        print(f"  routed mxu (3 einsums, {masks_gib:.2f} GiB resident masks)"
              f": {t * 1e3:7.3f} ms  ({bytes_min / t / 2**30:7.1f} GiB/s "
              f"effective, max|diff| {err:.3g})")
        f2 = jax.jit(functools.partial(route_gather_sum, rt=rt))
        got = np.asarray(f2(g), dtype=np.float32)
        err = np.max(np.abs(got - ref))
        t = _time_fn(f2, g, iters=args.iters)
        print(f"  routed takes (3 gathers)     : {t * 1e3:7.3f} ms  "
              f"({bytes_min / t / 2**30:7.1f} GiB/s effective, "
              f"max|diff| {err:.3g})")
        from spectre_tpu.ops.pallas.routed_gather import (
            routed_gather_sum_pallas)

        for bb in (128, 256):
            for tc in (32, 64):
                label = f"routed pallas bb={bb} tc={tc:<3d}"
                try:
                    f3 = jax.jit(functools.partial(
                        routed_gather_sum_pallas, rt=rt, block_b=bb,
                        t_chunk=tc))
                    got = np.asarray(f3(g), dtype=np.float32)
                    err = np.max(np.abs(got - ref))
                    t = _time_fn(f3, g, iters=args.iters)
                    print(f"  {label}: {t * 1e3:7.3f} ms  "
                          f"({bytes_min / t / 2**30:7.1f} GiB/s effective, "
                          f"max|diff| {err:.3g})")
                except Exception as e:  # Mosaic lowering gaps: report, go on
                    print(f"  {label}: FAILED "
                          f"{type(e).__name__}: {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
