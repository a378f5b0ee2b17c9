"""FORWARD mix-gather formulations, microbenched (VERDICT r3 #3).

The folded mix's forward is ``out[h*d + i] = xt[perms[h, i]]`` over the
[d, B] activation — a [d, B] -> [H*d, B] row gather (ops/fused_mix.py::
perm_rows_t_keyed, reference layers.py:71). Round 3 gave only the BACKWARD
the block-DMA treatment (block_gather_sum_pallas, 10.9 -> 1.9 ms); the
forward still runs ``jnp.take`` row gathers whose random source reads pay
the same (8,128)-tile amplification the backward did — each 2 KB logical
row fetch costs an 8-row tile block from the 68 MB source.

Traffic model at flagship shape (d=33280, H=16, B=1024, bf16):
  - output write: H*d*B*2 = 1.02 GiB (unavoidable — the projection GEMM
    consumes the materialized [H*d, B] tensor)
  - source read, perfect reuse: d*B*2 = 65 MiB (read each source row once)
  - source read, no reuse + 8x tile amplification: 8 * 1.02 GiB
``bytes_min`` below is write + read-once — the floor any formulation is
judged against.

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/fwd_gather_variants.py \
         [--blocks 64] [--pallas]
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.repl.perf import _time_fn


def make_uniform(rng, h, d):
    return jnp.asarray(
        np.stack([rng.permutation(d) for _ in range(h)]).astype(np.int32))


def make_block(rng, h, d, blk):
    nb = d // blk
    bperms = np.stack([rng.permutation(nb) for _ in range(h)]).astype(np.int32)
    perms = (bperms[:, :, None] * blk
             + np.arange(blk, dtype=np.int32)).reshape(h, d)
    return jnp.asarray(perms), jnp.asarray(bperms)


def fwd_flat(xt, perms):
    """Production forward (ops/fused_mix.py::perm_rows_t_keyed primal)."""
    return jnp.take(xt, perms.reshape(-1), axis=0, mode="clip")


def fwd_blocked_xla(xt, bsrc, blk):
    """Block-level take: reshape the source to [d/blk, blk*B] rows so every
    take moves a whole blk-row block (XLA can't infer this from the flat
    table — it has to be re-expressed)."""
    d, b = xt.shape
    xb = xt.reshape(d // blk, blk * b)
    return jnp.take(xb, bsrc.reshape(-1), axis=0,
                    mode="clip").reshape(-1, b)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--d", type=int, default=33280)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--blocks", type=int, nargs="*", default=[64])
    p.add_argument("--pallas", action="store_true",
                   help="also time the forward block-DMA Pallas kernel "
                        "(ops/pallas/bwd_gather.py::block_scatter_rows_pallas)")
    args = p.parse_args(argv)
    from spectre_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    h, d, b = args.heads, args.d, args.batch
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((d, b)), jnp.bfloat16)
    out_bytes = h * d * b * 2
    bytes_min = out_bytes + xt.nbytes  # write output + read source once
    print(f"xt [d={d}, B={b}] bf16 = {xt.nbytes / 2**20:.1f} MiB; "
          f"out [H*d={h * d}, B={b}] = {out_bytes / 2**30:.2f} GiB; "
          f"minimal traffic {bytes_min / 2**30:.2f} GiB")

    perms_u = make_uniform(rng, h, d)
    f = jax.jit(fwd_flat)
    t = _time_fn(f, xt, perms_u, iters=args.iters)
    print(f"  flat take, uniform tables : {t * 1e3:7.3f} ms  "
          f"({bytes_min / t / 2**30:7.1f} GiB/s effective)")

    for blk in args.blocks:
        if d % blk:
            continue
        perms_b, bsrc = make_block(rng, h, d, blk)
        t = _time_fn(f, xt, perms_b, iters=args.iters)
        print(f"  flat take, block blk={blk:<4d} : {t * 1e3:7.3f} ms  "
              f"({bytes_min / t / 2**30:7.1f} GiB/s effective)")
        fb = jax.jit(functools.partial(fwd_blocked_xla, blk=blk))
        ref = np.asarray(f(xt, perms_b))
        got = np.asarray(fb(xt, bsrc))
        assert (got == ref).all(), "blocked-XLA forward mismatch"
        t = _time_fn(fb, xt, bsrc, iters=args.iters)
        print(f"  blocked take (XLA) blk={blk:<4d}: {t * 1e3:7.3f} ms  "
              f"({bytes_min / t / 2**30:7.1f} GiB/s effective)")
        if args.pallas:
            from spectre_tpu.ops.pallas.bwd_gather import (
                block_scatter_rows_pallas)

            fp = jax.jit(functools.partial(block_scatter_rows_pallas, blk=blk))
            got = np.asarray(fp(xt, bsrc))
            err = int((got != ref).sum())
            t = _time_fn(fp, xt, bsrc, iters=args.iters)
            print(f"  blocked-pallas blk={blk:<4d}   : {t * 1e3:7.3f} ms  "
                  f"({bytes_min / t / 2**30:7.1f} GiB/s effective, "
                  f"mismatched elems {err})")


if __name__ == "__main__":
    main()
