"""Mix-formulation shootout at flagship scale (experiment harness).

The flagship train step's dominant non-GEMM cost is permutation-gather
traffic (BASELINE.md round-2 profile: ~11 ms/layer backward gather plus a
similar forward, x 4 layers). This script measures every formulation of the
mix op standalone -- forward and forward+backward -- with the truthful
slope-timing harness (repl/perf.py), to pick the layout that moves the
1.09 GB mixed tensor at the highest bandwidth.

Key hypothesis: gather *granule* size decides bandwidth.
- batch-major gather of [B, d] along d: granule = 1 element (XLA strides B).
- token-major gather of [d, B] rows: granule = B elems (2 KB bf16).
- batch-major structured tile-take: granule = tile elems (256 B).
- token-major structured tile-take of [T, t*B]: granule = t*B (256 KB-2 MB)
  -- contiguous block moves, DMA-friendly; the intra-tile Hadamard is a
  batched MXU matmul and the signs a VPU pass.

Run: python benchmarks/mix_formulations.py [--batch 1024] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.ops import (
    hadamard_matrix,
    make_mix_tables,
    make_structured_tables,
    permut_mix_fused,
    permut_mix_fused_t,
)
from spectre_tpu.repl.perf import _dispatch_floor, _fmt, _time_fn


def structured_mix_tm(xt, tile_perms, signs2, tile):
    """Token-major structured mix: xt [d, B] -> [H*d, B].

    take along axis 0 of [T, t*B] moves t*B-contiguous granules; the
    intra-tile Hadamard contracts t on the MXU with B as lanes.
    """
    d, B = xt.shape
    H, T = tile_perms.shape
    t = tile
    x3 = xt.reshape(T, t * B)
    g = jnp.take(x3, tile_perms.reshape(-1), axis=0)  # [H*T, t*B]
    had = hadamard_matrix(t, xt.dtype)
    mixed = jnp.einsum("st,ktb->ksb", had, g.reshape(H * T, t, B))
    mixed = mixed * signs2.reshape(H * T, t)[..., None]
    return mixed.reshape(H * d, B)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--embed", type=int, default=512)
    p.add_argument("--tokens", type=int, default=65)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)

    B, E, N, H = args.batch, args.embed, args.tokens, args.heads
    d = E * N
    dt = jnp.dtype(args.dtype)
    floor = _dispatch_floor()
    print(f"B={B} d={d} H={H} dtype={dt} | mixed tensor "
          f"{B * H * d * dt.itemsize / 2**30:.2f} GiB | dispatch floor "
          f"{floor*1e3:.3f} ms")

    rng = np.random.default_rng(0)
    x2d = jnp.asarray(rng.standard_normal((B, d)), dtype=dt)
    xt = jnp.asarray(np.ascontiguousarray(np.asarray(x2d).T))
    perms, signs = make_mix_tables(jax.random.key(0), H, d)
    signs2 = signs[0].astype(dt)

    def fb(fn):
        """forward + backward (sum-of-output cotangent) as one jitted call."""
        def run(*a):
            out, vjp = jax.vjp(fn, *a)
            return vjp(jnp.ones_like(out))[0]
        return jax.jit(run)

    # --- exact gather, batch-major (current default path) ---
    f = jax.jit(lambda x: permut_mix_fused(x, perms, signs2))
    t_fwd = _time_fn(f, x2d, iters=args.iters)
    t_fb = _time_fn(fb(lambda x: permut_mix_fused(x, perms, signs2)), x2d,
                    iters=args.iters)
    bw = 2 * B * H * d * dt.itemsize / t_fwd / 2**30
    print(f"gather batch-major   : fwd {_fmt(t_fwd, floor)} ({bw:.0f} GiB/s) "
          f"| fwd+bwd {_fmt(t_fb, floor)}")

    # --- exact gather, token-major ---
    f = jax.jit(lambda x: permut_mix_fused_t(x, perms, signs2))
    t_fwd = _time_fn(f, xt, iters=args.iters)
    t_fb = _time_fn(fb(lambda x: permut_mix_fused_t(x, perms, signs2)), xt,
                    iters=args.iters)
    bw = 2 * B * H * d * dt.itemsize / t_fwd / 2**30
    print(f"gather token-major   : fwd {_fmt(t_fwd, floor)} ({bw:.0f} GiB/s) "
          f"| fwd+bwd {_fmt(t_fb, floor)}")

    # --- structured, batch-major (current structured path) ---
    from spectre_tpu.ops import structured_mix
    for tile in (128, 256, 512):
        if d % tile:
            continue
        tperms, ssigns = make_structured_tables(jax.random.key(0), H, d, tile=tile)
        ss2 = ssigns[0].astype(dt)
        x3 = x2d.reshape(B, N, E)
        f = jax.jit(partial(structured_mix, token_dim=N))
        t_fwd = _time_fn(f, x3, tperms, ssigns.astype(dt), iters=args.iters)
        t_fb = _time_fn(fb(lambda x: structured_mix(x, tperms, ssigns.astype(dt), N)),
                        x3, iters=args.iters)
        bw = 2 * B * H * d * dt.itemsize / t_fwd / 2**30
        print(f"struct bmajor t={tile:4d}: fwd {_fmt(t_fwd, floor)} ({bw:.0f} GiB/s) "
              f"| fwd+bwd {_fmt(t_fb, floor)}")

        # --- structured, token-major ---
        f = jax.jit(partial(structured_mix_tm, tile=tile))
        t_fwd = _time_fn(f, xt, tperms, ss2, iters=args.iters)
        t_fb = _time_fn(fb(lambda x: structured_mix_tm(x, tperms, ss2, tile)), xt,
                        iters=args.iters)
        bw = 2 * B * H * d * dt.itemsize / t_fwd / 2**30
        print(f"struct tmajor t={tile:4d}: fwd {_fmt(t_fwd, floor)} ({bw:.0f} GiB/s) "
              f"| fwd+bwd {_fmt(t_fb, floor)}")


if __name__ == "__main__":
    main()
