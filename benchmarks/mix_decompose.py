"""Decompose the mix op's cost: which primitive moves bytes at what speed.

Isolates each stage of every mix formulation at flagship scale so the layout
decision is made on measured granule bandwidth, not guesses.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.ops import hadamard_matrix, make_mix_tables, make_structured_tables
from spectre_tpu.repl.perf import _dispatch_floor, _fmt, _time_fn


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--embed", type=int, default=512)
    p.add_argument("--tokens", type=int, default=65)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)
    B, E, N, H = args.batch, args.embed, args.tokens, args.heads
    d = E * N
    dt = jnp.bfloat16
    floor = _dispatch_floor()
    gib = B * H * d * 2 / 2**30  # output bytes

    rng = np.random.default_rng(0)
    x2d = jnp.asarray(rng.standard_normal((B, d)), dtype=dt)
    xt = jnp.asarray(np.ascontiguousarray(np.asarray(x2d).T))
    perms, signs = make_mix_tables(jax.random.key(0), H, d)
    signs2 = signs[0].astype(dt)
    g_bhd = jnp.asarray(rng.standard_normal((B, H, d)), dtype=dt)
    g_hdb = jnp.asarray(rng.standard_normal((H, d, B)), dtype=dt)

    def row(name, t, mult=2.0):
        print(f"  {name:42s}: {_fmt(t, floor):24s} {mult * gib / t:7.0f} GiB/s")

    print(f"B={B} d={d} H={H} bf16; out tensor {gib:.2f} GiB; floor {floor*1e3:.2f} ms")

    print("exact gather stages:")
    row("take bmajor [B,d]->[B,H,d]",
        _time_fn(jax.jit(lambda x: jnp.take(x, perms, axis=1)), x2d, iters=args.iters))
    row("take tmajor [d,B]->[H*d,B]",
        _time_fn(jax.jit(lambda x: jnp.take(x, perms.reshape(-1), axis=0)), xt,
                 iters=args.iters))
    row("signs mult [B,H,d]",
        _time_fn(jax.jit(lambda g: g * signs2), g_bhd, iters=args.iters))
    inv = jnp.argsort(perms, axis=-1)
    row("bwd: take_along(gs,inv,2).sum(1) bmajor",
        _time_fn(jax.jit(lambda g: jnp.take_along_axis(g, inv[None], axis=2).sum(axis=1)),
                 g_bhd, iters=args.iters), mult=3.0)
    row("bwd tmajor: take_along(g,inv,1).sum(0)",
        _time_fn(jax.jit(lambda g: jnp.take_along_axis(g, inv[:, :, None], axis=1).sum(axis=0)),
                 g_hdb, iters=args.iters), mult=3.0)
    # fused multiply+gather+sum in one jit (lets XLA fuse the sign pass)
    row("bwd full bmajor (s*g, inv-take, sum)",
        _time_fn(jax.jit(lambda g: jnp.take_along_axis(g * signs2, inv[None], axis=2)
                         .sum(axis=1)), g_bhd, iters=args.iters), mult=4.0)

    for tile in (128, 512):
        tperms, _ = make_structured_tables(jax.random.key(0), H, d, tile=tile)
        T = d // tile
        print(f"structured stages, tile={tile} (T={T}):")
        x3 = x2d.reshape(B, T, tile)
        row("tile-take bmajor [B,T,t]",
            _time_fn(jax.jit(lambda x: jnp.take(x, tperms, axis=1)), x3,
                     iters=args.iters))
        xt3 = xt.reshape(T, tile * B)
        row("tile-take tmajor [T,t*B]",
            _time_fn(jax.jit(lambda x: jnp.take(x, tperms.reshape(-1), axis=0)), xt3,
                     iters=args.iters))
        had = hadamard_matrix(tile, dt)
        gt = jnp.asarray(rng.standard_normal((H * T, tile, B)), dtype=dt)
        row("hadamard einsum tmajor [HT,t,B]",
            _time_fn(jax.jit(lambda g: jnp.einsum("st,ktb->ksb", had, g)), gt,
                     iters=args.iters))
        gb = jnp.asarray(rng.standard_normal((B, H, T, tile)), dtype=dt)
        row("hadamard einsum bmajor [B,H,T,t]",
            _time_fn(jax.jit(lambda g: jnp.einsum("bhnt,ts->bhns", g, had)), gb,
                     iters=args.iters))

    print("pure copies (reference points):")
    row("copy [B,H,d] -> itself * 1",
        _time_fn(jax.jit(lambda g: g * jnp.bfloat16(1.000001)), g_bhd, iters=args.iters))
    row("transpose [B,d] -> [d,B]",
        _time_fn(jax.jit(lambda x: x.T.reshape(d, B) * jnp.bfloat16(1.000001)), x2d,
                 iters=args.iters), mult=2.0 / H)


if __name__ == "__main__":
    main()
