"""Routed-kernel factorization matrix under the Mosaic code-size cliff.

Diag results (benchmarks/routed_kernel_diag.py, routed_kernel_c256.py):
the remote TPU compiler crashes when the kernel's statically-unrolled
dot_general count (c/tc)*(2r + tc) crosses ~1200 (1152 OK at r=128;
1296 and up crash). d=33280 factors three ways with power-of-two c:
260x128, 130x256, 65x512. Configs under the cliff:

  c=512 tc=128 -> 4*(130+128) = 1032   (r=65 batch dots)
  c=512 tc=256 -> 2*(130+256) =  772
  c=256 tc=256 -> 1*(260+256) =  516   (VMEM borderline: full-c staging)

This measures each at the REAL flagship backward shape (H=16, d=33280,
B=1024) against the shipped per-head XLA gather (10.9-11.1 ms measured).

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/routed_kernel_matrix.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.ops.routing import build_route_tables_cached
from spectre_tpu.ops.pallas.routed_gather import routed_gather_sum_pallas
from spectre_tpu.repl.perf import _time_fn
from spectre_tpu.utils.cache import enable_compilation_cache


def per_head(g, inv, h, d):
    gh = g.reshape(h, d, -1)
    acc = jnp.take(gh[0], inv[0], axis=0)
    for i in range(1, h):
        acc = acc + jnp.take(gh[i], inv[i], axis=0)
    return acc


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    h, d, b = 16, 33280, 1024
    perms = np.stack([rng.permutation(d) for _ in range(h)])
    inv = np.argsort(perms, -1).astype(np.int32)
    g = jnp.asarray(rng.standard_normal((h * d, b)), jnp.bfloat16)
    inv_j = jnp.asarray(inv)
    bytes_min = g.nbytes + d * b * 2

    f0 = jax.jit(functools.partial(per_head, h=h, d=d))
    ref = np.asarray(f0(g, inv_j), np.float32)
    t = _time_fn(f0, g, inv_j, iters=30)
    print(f"  per_head (shipped)        : {t * 1e3:7.3f} ms "
          f"({bytes_min / t / 2**30:6.1f} GiB/s eff)", flush=True)

    for c, tc in ((512, 128), (512, 256), (256, 256)):
        rt = build_route_tables_cached(inv, c=c)
        unroll = (c // tc) * (2 * rt.r + tc)
        label = f"routed c={c} tc={tc} (unroll {unroll})"
        try:
            f = jax.jit(functools.partial(routed_gather_sum_pallas,
                                          rt=rt, block_b=128, t_chunk=tc))
            got = np.asarray(f(g), np.float32)
            err = np.max(np.abs(got - ref))
            t = _time_fn(f, g, iters=30)
            print(f"  {label}: {t * 1e3:7.3f} ms "
                  f"({bytes_min / t / 2**30:6.1f} GiB/s eff, "
                  f"max|diff| {err:.3g})", flush=True)
        except Exception as e:
            print(f"  {label}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
