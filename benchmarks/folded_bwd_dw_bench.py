"""dW formulation micro-bench for folded_proj's backward (ops/fused_mix.py).

dW[e,o] = sum_{n,b} (s4*g4)[n,e,b] dy[n,b,o]. Candidates:

  a) explicit [n,e,b] -> [e, n*b] transpose+reshape feeding one GEMM (the
     round-2 shipped form — the transpose is a real 1.02 GiB relayout)
  b) dot_general contracting {n, b} directly (XLA picks the layout) — the
     SHIPPED form since round 3
  c) batched per-token GEMM [n,e,o] then sum over n (no relayout, f32 partials)

Measured raw-window, v5e flagship shape: a) 4.03 ms  b) 3.47 ms  c) 3.49 ms.

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/folded_bwd_dw_bench.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N, E, B, O = 65, 8192, 1024, 512


def timed(fn, *args, iters=50):
    # ONE long raw window with a hard D2H fetch at the end. The two-point
    # slope variant (5-iter vs 25-iter windows) was tried first and produced
    # PHYSICALLY IMPOSSIBLE numbers here (1.49 ms for a 558 GFLOP dW = 375
    # TFLOP/s on a 197 TFLOP/s-peak v5e): with windows this short the first
    # window absorbs queue/warmup transients, and subtracting it inflates
    # nothing out — it deflates the slope. 50 dispatches against one ~8 MB
    # fetch keeps the tunnel constant <2% of the window instead.
    out = fn(*args)
    np.asarray(out)  # warm + hard sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e3, out


def main():
    rng = np.random.default_rng(0)
    g4 = jnp.asarray(rng.standard_normal((N, E, B)), dtype=jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((N, B, O)), dtype=jnp.bfloat16)
    s4 = jnp.asarray(rng.choice([-1.0, 1.0], (N, E)), dtype=jnp.bfloat16)

    @jax.jit
    def dw_shipped(g4, dy, s4):
        sg = (s4[:, :, None] * g4).transpose(1, 0, 2).reshape(E, N * B)
        return sg @ dy.reshape(N * B, O)

    @jax.jit
    def dw_dotgen(g4, dy, s4):
        sg = s4[:, :, None] * g4
        return jax.lax.dot_general(
            sg, dy, (((0, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32).astype(g4.dtype)

    @jax.jit
    def dw_batched(g4, dy, s4):
        sg = s4[:, :, None] * g4
        part = jax.lax.dot_general(
            sg, dy, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [N, E, O]
        return part.sum(0).astype(g4.dtype)

    ms_a, out_a = timed(dw_shipped, g4, dy, s4)
    ms_b, out_b = timed(dw_dotgen, g4, dy, s4)
    ms_c, out_c = timed(dw_batched, g4, dy, s4)
    ref = np.asarray(out_a, dtype=np.float32)
    for name, ms, out in [("shipped transpose+GEMM", ms_a, out_a),
                          ("dot_general {n,b}", ms_b, out_b),
                          ("batched + sum", ms_c, out_c)]:
        diff = float(np.abs(np.asarray(out, np.float32) - ref).max())
        print(f"{name:24s} {ms:7.2f} ms   max|diff vs a| {diff:.3e}")


if __name__ == "__main__":
    main()
