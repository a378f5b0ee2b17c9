"""Per-op profile of one SpectreEncoderLayer fwd+bwd for a given mix_impl.

Usage: PYTHONPATH=... python benchmarks/layer_profile.py [impl] [out.csv]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.models.spectre import SpectreEncoderLayer
from spectre_tpu.profile import ProfilerParser, trace_step


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "folded"
    out = sys.argv[2] if len(sys.argv) > 2 else f"plots/layer_{impl}.csv"
    B, N, E, H, FF = 1024, 65, 512, 16, 768
    layer = SpectreEncoderLayer(seq_length=N, d_model=E, nhead=H,
                                dim_feedforward=FF, dropout=0.0,
                                mix_impl=impl, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, N, E)),
                    jnp.bfloat16)
    v = layer.init(jax.random.key(0), x)

    def loss(params, xx):
        return jnp.sum(layer.apply({**v, "params": params},
                                   xx).astype(jnp.float32) ** 2)

    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
    for _ in range(3):
        r = grad(v["params"], x)
    float(np.asarray(jax.tree.leaves(r)[0]).sum())
    with trace_step(f"plots/layer_trace_{impl}") as t:
        for _ in range(3):
            r = grad(v["params"], x)
        float(np.asarray(jax.tree.leaves(r)[0]).sum())
    (ProfilerParser(t.path).remove_idle().add_percentages().round()
     .sort_by_device().head(40).show().to_csv(out))
    print("wrote", out)


if __name__ == "__main__":
    main()
