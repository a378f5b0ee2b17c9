"""Fused mix-backward (GEMM+block-gather in one Pallas kernel) vs the
production two-op chain, at the exact flagship backward shape.

The production backward (ops/fused_mix.py::_bwd_folded_proj + the
registered block route) writes the [H·d, B] dmixed cotangent (1.02 GiB
bf16) from the dmixed GEMM, then re-reads it in the block-DMA gather —
~2.5 GiB of HBM traffic beyond the fused kernel's, which keeps dy and w
VMEM-resident and emits each output block as 16 on-chip [blk, O] x [Bc, O]
MXU contractions (ops/pallas/bwd_gather.py::fused_block_bwd_pallas).

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/fused_bwd_bench.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.ops.pallas.bwd_gather import (
    block_gather_sum_pallas,
    fused_block_bwd_pallas,
)
from spectre_tpu.repl.perf import _time_fn


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--tokens", type=int, default=65)
    p.add_argument("--embed", type=int, default=512)
    p.add_argument("--out-dim", type=int, default=512)
    p.add_argument("--blk", type=int, default=64)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)
    h, n, e, o, b, blk = (args.heads, args.tokens, args.embed, args.out_dim,
                          args.batch, args.blk)
    d = n * e
    eh = e * h
    nb = d // blk
    rng = np.random.default_rng(0)
    binv = jnp.asarray(np.stack([rng.permutation(nb) for _ in range(h)])
                       .astype(np.int32))
    dy = jnp.asarray(rng.standard_normal((n, b, o)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((eh, o)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    s4 = jnp.asarray(rng.choice([-1.0, 1.0], (n, eh)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    @jax.jit
    def chain(dy, w, s4):
        dg = s4[:, :, None] * jnp.einsum("nbo,eo->neb", dy, w)
        return block_gather_sum_pallas(dg.reshape(h * d, b), binv, blk)

    @jax.jit
    def fused(dy, w, s4):
        return fused_block_bwd_pallas(dy, w, s4, binv, blk)

    a = chain(dy, w, s4)
    c = fused(dy, w, s4)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - c.astype(jnp.float32))))
    print(f"shape: d={d} H={h} B={b} O={o} blk={blk}; "
          f"max|chain-fused|={diff:.4f} (bf16 outputs)")
    t1 = _time_fn(chain, dy, w, s4, iters=args.iters)
    t2 = _time_fn(fused, dy, w, s4, iters=args.iters)
    gf = 2 * d * h * o * b / 1e9
    print(f"  production chain (einsum + block-DMA gather): {t1*1e3:8.3f} ms"
          f"  ({gf/t1:6.0f} GFLOP/s)")
    print(f"  fused kernel:                                 {t2*1e3:8.3f} ms"
          f"  ({gf/t2:6.0f} GFLOP/s)")
    print(f"  speedup: {t1/t2:.2f}x")


if __name__ == "__main__":
    main()
