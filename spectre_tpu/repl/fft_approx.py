"""Learned-FFT-approximation study (reference repl/fft_approx.py:17-106).

Trains ``FFTApproximator`` (a single unconstrained Dense D -> D//2+1) to
regress Re(rfft) targets on random inputs with MSE, then times the learned
approximation against the true rfft (jnp and DFT-matmul formulations) across
pow2 and non-pow2 dims. The reference's ONNX-runtime passes map to the
StableHLO export path here.

    python -m spectre_tpu.repl.fft_approx [--dim 256] [--steps 2000]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spectre_tpu.models.layers import FFTApproximator
from spectre_tpu.ops import rfft_real


def train_approximator(dim: int, steps: int, batch: int = 256,
                       lr: float = 1e-3, seed: int = 0):
    model = FFTApproximator(dim=dim)
    params = model.init(jax.random.key(seed), jnp.zeros((1, dim)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        x = jax.random.normal(key, (batch, dim))
        target = rfft_real(x)

        def loss_fn(p):
            return jnp.mean((model.apply(p, x) - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(seed + 1)
    loss = None
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        if i % max(1, steps // 10) == 0:
            print(f"  step {i}: mse {float(loss):.6f}")
    print(f"final mse {float(loss):.6f}")
    return model, params


def time_fn(fn, *args, iters=200):
    # slope timing (repl/perf.py): block_until_ready does not block on
    # independent dispatch chains on this runtime
    from spectre_tpu.repl.perf import _time_fn

    return _time_fn(fn, *args, iters=iters)


def timing_sweep(model, params, batch: int = 64):
    print("approx vs rfft timing (ms/iter), pow2 + non-pow2 dims")
    for dim in [256, 512, 1000, 1024, 3000, 4096]:
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, dim)).astype(np.float32))
        t_fft = time_fn(jax.jit(rfft_real), x)
        row = f"  dim={dim}: rfft {t_fft * 1e3:.4f}"
        if dim == model.dim:
            t_apx = time_fn(jax.jit(lambda xx: model.apply(params, xx)), x)
            row += f" | learned-approx {t_apx * 1e3:.4f}"
        print(row)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args(argv)
    model, params = train_approximator(args.dim, args.steps, args.batch)
    timing_sweep(model, params)


if __name__ == "__main__":
    main()
