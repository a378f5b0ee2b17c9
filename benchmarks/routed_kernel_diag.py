"""Diagnose the routed-gather Pallas kernel's remote-compile crash.

benchmarks/bwd_gather_variants.py --routed found every flagship-shape
(r=260, c=128) compile of ops/pallas/routed_gather.py dying inside the
remote tpu_compile_helper (opaque HTTP 500, no Mosaic diagnostics over the
tunnel). This sweep compiles the SAME kernel at growing r (the batch size
of its batched ``lax.dot_general``s — the prime suspect: Mosaic unrolls
dot batch dims, so code size grows linearly in r) to locate the boundary:
a clean small-r compile means code-size/unroll, an r=16 failure means a
structural lowering problem (the sublane-split reshape or batched dot
semantics).

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/routed_kernel_diag.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.ops.routing import build_route_tables
from spectre_tpu.ops.pallas.routed_gather import routed_gather_sum_pallas
from spectre_tpu.repl.perf import _time_fn
from spectre_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    h, b = 4, 256
    for r in (16, 32, 64, 128, 260):
        d = r * 128
        perms = np.stack([rng.permutation(d) for _ in range(h)])
        inv = np.argsort(perms, -1).astype(np.int32)
        rt = build_route_tables(inv)
        g = jnp.asarray(rng.standard_normal((h * d, b)), jnp.bfloat16)
        for tc in (32,):
            try:
                f = jax.jit(functools.partial(routed_gather_sum_pallas,
                                              rt=rt, block_b=128, t_chunk=tc))
                ref = np.asarray(jnp.take(g.reshape(h, d, b)[0],
                                          jnp.asarray(inv[0]), axis=0)
                                 + sum(jnp.take(g.reshape(h, d, b)[i],
                                                jnp.asarray(inv[i]), axis=0)
                                       for i in range(1, h)), np.float32)
                got = np.asarray(f(g), np.float32)
                err = float(np.max(np.abs(got - ref)))
                t = _time_fn(f, g, iters=20)
                print(f"r={r:4d} tc={tc}: OK {t * 1e3:8.3f} ms "
                      f"max|diff| {err:.3g}", flush=True)
            except Exception as e:
                print(f"r={r:4d} tc={tc}: FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:150]}", flush=True)


if __name__ == "__main__":
    main()
