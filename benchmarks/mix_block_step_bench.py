"""Flagship train step with BLOCK-structured mix permutations, measured.

bench.py's exact program (aug + fwd + bwd + AdamW on the flagship
spectre_vit_cifar100 config at B=1024) with ``mix_block`` set, so the folded
mix's backward runs the full-bandwidth Pallas block gather
(ops/pallas/bwd_gather.py::block_gather_sum_pallas) instead of the
8x-tile-amplified per-head takes. Standalone kernel numbers
(bwd_gather_variants.py --blocks): per-head 10.8-11.1 ms vs block-DMA
1.90 ms at blk=64 — this harness reports what that buys the COMPOSITE step.

Timing discipline matches bench.py: two-point slope with a terminal scalar
D2H fetch (the ~30 ms tunnel constant cancels in the slope).

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/mix_block_step_bench.py \
        [--blk 64 0] [--batch 1024] [--iters 20]
"""

from __future__ import annotations

import argparse
import time

import jax.numpy as jnp
import numpy as np


def timed_steps(step, state, images, labels, n):
    t0 = time.perf_counter()
    metrics = None
    for _ in range(n):
        state, metrics = step(state, images, labels)
    loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(loss), loss
    return state, time.perf_counter() - t0, loss


def measure(blk: int, batch: int, iters: int) -> float:
    from spectre_tpu.configs import parse_config
    from spectre_tpu.data import CIFAR100_MEAN, CIFAR100_STD, make_train_augment
    from spectre_tpu.models import build_model
    from spectre_tpu.ops.fused_mix import (
        clear_mix_routes, register_block_mix_routes)
    from spectre_tpu.train import (
        create_train_state, make_optimizer, make_train_step)

    cfg = parse_config("spectre_tpu/configs/spectre_vit_cifar100.py")
    cfg.batch_size = batch
    cfg.mix_block = blk
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=195)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(
        0, 1, (batch, cfg.in_channels, cfg.img_size,
               cfg.img_size)).astype(np.float32))
    labels = jnp.asarray(rng.integers(
        0, cfg.num_classes, batch).astype(np.int32))
    state = create_train_state(model, tx, images, seed=0)
    clear_mix_routes()
    if blk:
        keys = register_block_mix_routes(state.variables())
        assert keys, "block tables expected but no routes registered"
    step = make_train_step(model, augment_fn=make_train_augment(
        CIFAR100_MEAN, CIFAR100_STD))
    state, _, _ = timed_steps(step, state, images, labels, 5)  # warmup
    n1 = max(2, iters // 5)
    state, t1, _ = timed_steps(step, state, images, labels, n1)
    state, t2, loss = timed_steps(step, state, images, labels, iters)
    dt = (t2 - t1) / (iters - n1)
    print(f"mix_block={blk:<4d}: {dt * 1e3:8.2f} ms/step "
          f"({batch / dt:8.0f} img/s)  loss {loss:.4f}", flush=True)
    return dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--blk", type=int, nargs="*", default=[64, 0])
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)
    from spectre_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    for blk in args.blk:
        measure(blk, args.batch, args.iters)


if __name__ == "__main__":
    main()
