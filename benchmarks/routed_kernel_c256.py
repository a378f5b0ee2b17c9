"""Flagship routed-gather kernel with the c=256 factorization (r=130).

benchmarks/routed_kernel_diag.py located the remote-compile cliff for
ops/pallas/routed_gather.py between r=128 (OK) and r=260 (tpu_compile_helper
crash) — Mosaic statically unrolls dot_general batch dims, so code size is
linear in r. d=33280 also factors as 130 x 256 (c must be a power of two
for the Euler-split edge colouring); r=130 sits under the cliff. This
measures that factorization at the REAL flagship backward shape
(H=16, d=33280, B=1024) against the shipped per-head XLA gather.

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/routed_kernel_c256.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.ops.routing import build_route_tables, route_gather_sum_mxu, route_onehots
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
    print(f"  per_head (shipped)      : {t * 1e3:7.3f} ms "
          f"({bytes_min / t / 2**30:6.1f} GiB/s eff)", flush=True)

    import time
    t0 = time.perf_counter()
    rt = build_route_tables(inv, c=256)
    print(f"  route tables c=256: {time.perf_counter() - t0:.1f} s "
          f"r={rt.r} c={rt.c}", flush=True)

    for bb in (128,):
        for tc in (32, 64):
            label = f"routed pallas c256 bb={bb} tc={tc:<3d}"
            try:
                f = jax.jit(functools.partial(routed_gather_sum_pallas,
                                              rt=rt, block_b=bb, t_chunk=tc))
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
