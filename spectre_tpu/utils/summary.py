"""Model summary: parameter counts and compiled-cost estimates.

The reference printed raw param counts at build (train.py:86, test.py:59-62);
here the XLA cost model also reports FLOPs/bytes for the jitted forward so
perf work has a roofline denominator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def model_summary(model, example_input: jnp.ndarray, seed: int = 0) -> dict:
    variables = model.init(jax.random.key(seed), example_input)
    n_params = sum(int(p.size) for p in jax.tree.leaves(variables.get("params", {})))
    n_buffers = sum(int(b.size) for b in jax.tree.leaves(variables.get("buffers", {})))

    lowered = jax.jit(lambda v, x: model.apply(v, x)).lower(variables, example_input)
    cost = {}
    try:
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        cost = {
            "flops": float(analysis.get("flops", 0.0)),
            "bytes_accessed": float(analysis.get("bytes accessed", 0.0)),
        }
    except Exception:  # cost analysis is backend-dependent
        pass
    return {"params": n_params, "buffer_elems": n_buffers, **cost}


def format_summary(name: str, summary: dict) -> str:
    parts = [f"{name}: {summary['params']:,} params"]
    if summary.get("buffer_elems"):
        parts.append(f"{summary['buffer_elems']:,} buffer elems")
    if summary.get("flops"):
        parts.append(f"{summary['flops'] / 1e9:.2f} GFLOP/fwd")
    if summary.get("bytes_accessed"):
        parts.append(f"{summary['bytes_accessed'] / 1e6:.1f} MB touched")
    return " | ".join(parts)
