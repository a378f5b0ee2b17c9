"""Per-impl SpectreEncoderLayer fwd / fwd+bwd timing at flagship scale.

The decision harness for mix_impl: times one full encoder layer (mix +
projection + pool + LN/GELU + FF) under each implementation with a
non-constant loss (no dead-code-eliminable forward) using the slope-timing
method. Run: PYTHONPATH=/root/.axon_site:. python benchmarks/layer_impls.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.models.spectre import SpectreEncoderLayer
from spectre_tpu.repl.perf import _dispatch_floor, _time_fn


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--embed", type=int, default=512)
    p.add_argument("--tokens", type=int, default=65)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--hidden", type=int, default=768)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--impls", nargs="*",
                   default=["gather", "folded", "gather_tm", "structured"])
    args = p.parse_args(argv)
    B = args.batch
    floor = _dispatch_floor()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, args.tokens, args.embed)), jnp.bfloat16)
    print(f"B={B} N={args.tokens} E={args.embed} H={args.heads} bf16 "
          f"(floor {floor*1e3:.2f} ms)")

    for impl in args.impls:
        layer = SpectreEncoderLayer(
            seq_length=args.tokens, d_model=args.embed, nhead=args.heads,
            dim_feedforward=args.hidden, dropout=0.0, mix_impl=impl,
            dtype=jnp.bfloat16)
        v = layer.init(jax.random.key(0), x)

        fwd = jax.jit(lambda vv, xx: layer.apply(vv, xx))

        def loss(params, xx):
            return jnp.sum(layer.apply({**v, "params": params},
                                       xx).astype(jnp.float32) ** 2)

        # grads wrt params AND input: the full training-time backward
        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_f = _time_fn(fwd, v, x, iters=args.iters)
        t_g = _time_fn(grad, v["params"], x, iters=args.iters)
        print(f"  {impl:12s}: fwd {t_f*1e3:7.3f} ms | fwd+bwd {t_g*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
