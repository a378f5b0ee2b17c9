"""Headline benchmark: SpectreViT CIFAR-100 training throughput on TPU.

Measures images/sec/chip of the full compiled training step (device-side
augmentation + fwd + bwd + AdamW update) on the flagship config — the
BASELINE.json north-star metric. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Truth machinery (round-1's number was retracted as physically impossible —
BASELINE.md "Retraction"):

- ground-truth synchronization: every timed region ends with an
  ``np.asarray`` D2H copy of the loss, which cannot complete before the
  device finishes (the donated-state chain serializes dispatch, so the final
  fetch is a true barrier);
- two-point slope timing: the loop is timed at two ITERS counts; the slope
  cancels the constant ~30 ms tunnel fetch latency exactly, and a negative
  slope/implied-constant hard-fails (a sub-linear clock means the runtime
  lies about completion — exactly round 1's failure mode);
- MFU line: FLOPs/step from ``compiled.cost_analysis()`` divided by the
  chip's published bf16 peak. Any result implying >100% MFU hard-fails.

``vs_baseline`` is measured like-for-like: the reference's own PyTorch
``SpectreViT`` + AdamW recipe on this host's CPU (torch 2.13, 1 core) does
6.97 img/s — measured by ``benchmarks/torch_cpu_baseline.py``, recorded in
BASELINE.md. The BASELINE.json A100 target (>=3x A100 img/s/chip) remains
UNMEASURED (no GPU in this environment) and is reported as such.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Measured on this host by benchmarks/torch_cpu_baseline.py (B=32, eager
# fp32, the reference's actual model imported from /root/reference).
TORCH_CPU_IMG_PER_SEC = 6.97

# Published bf16 dense peak by device kind (jax.devices()[0].device_kind).
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}

WARMUP = 10
ITERS_SHORT = 15
ITERS = 45
REPS = 2
# Throughput-optimal batch: the model is dispatch/HBM-bound at small batch;
# batch is a training hyperparameter, not model semantics (the reference's
# harness swept shapes too, test.py:31).
BENCH_BATCH = 1024


def _timed(step, state, images, labels, iters):
    """Run ``iters`` steps and return (new_state, seconds). The final
    np.asarray D2H copy of the loss serializes against device completion."""
    t0 = time.perf_counter()
    metrics = None
    for _ in range(iters):
        state, metrics = step(state, images, labels)
    loss = np.asarray(metrics["loss"])
    dt = time.perf_counter() - t0
    if not np.isfinite(loss):
        raise RuntimeError(f"non-finite loss in benchmark: {loss}")
    return state, dt


def main():
    from spectre_tpu.configs import parse_config
    from spectre_tpu.data import CIFAR100_MEAN, CIFAR100_STD, make_train_augment
    from spectre_tpu.models import build_model
    from spectre_tpu.train import create_train_state, make_optimizer, make_train_step

    from spectre_tpu.parallel import create_mesh, replicated_sharding, shard_batch

    cfg = parse_config("spectre_tpu/configs/spectre_vit_cifar100.py")
    cfg.batch_size = BENCH_BATCH
    batch = int(cfg.batch_size)
    n_chips = jax.device_count()
    device_kind = jax.devices()[0].device_kind
    peak = PEAK_BF16_FLOPS.get(device_kind)

    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=195)
    x_init = jnp.zeros((batch, cfg.in_channels, cfg.img_size, cfg.img_size))
    state = create_train_state(model, tx, x_init, seed=0)

    # the per-chip division below is only honest if the step actually runs
    # data-parallel over every chip: shard the batch, replicate the state
    # (exactly the train loop's layout) — on 1 chip this is a no-op
    mesh = create_mesh()
    state = jax.device_put(state, replicated_sharding(mesh))

    # mirror the train loop's route registration (train/loop.py): with the
    # flagship config's block-structured tables (mix_block=64) the mix
    # backward runs the Pallas block-DMA gather; without registration it
    # would silently fall back to the per-head takes and measure those
    if getattr(cfg, "mix_block", 0):
        from spectre_tpu.ops.fused_mix import register_block_mix_routes

        # mesh=mesh matters: the batch is sharded over every chip below, and
        # the Pallas block-gather backward has no GSPMD rule — registration
        # must match train_from_config's (train/loop.py) so the backward runs
        # under shard_map per batch shard on multi-chip hosts (degrades to
        # the plain single-chip call when mesh.size == 1)
        keys = register_block_mix_routes(state.variables(), mesh=mesh)
        assert keys, "mix_block set but no block routes registered"
    else:
        from spectre_tpu.ops.fused_mix import clear_mix_routes

        clear_mix_routes()

    rng = np.random.default_rng(0)
    sharded = shard_batch(mesh, {
        "image": rng.uniform(0, 1, x_init.shape).astype(np.float32),
        "label": rng.integers(0, cfg.num_classes, batch).astype(np.int32),
    })
    images, labels = sharded["image"], sharded["label"]

    augment = make_train_augment(CIFAR100_MEAN, CIFAR100_STD)
    # augmentation compiles into the step: ONE dispatch per iteration
    train_step = make_train_step(model, augment_fn=augment)

    # compile ONCE (remote compiles are minutes-scale); the AOT executable
    # both reports FLOPs and runs the timed loop
    compiled = train_step.lower(state, images, labels).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops_per_step = float(ca.get("flops", float("nan")))
    step = compiled

    for _ in range(WARMUP):
        state, metrics = step(state, images, labels)
    np.asarray(metrics["loss"])

    # two-point slope timing: both runs end with the same constant D2H
    # scalar-fetch (~30 ms through the tunnel); the slope between the two
    # ITERS counts cancels it exactly, so per-step time stays truthful even
    # when steps get fast. Guards: positive slope, a non-negative estimated
    # fetch constant (a significantly negative constant means time is NOT
    # linear in ITERS — the round-1 lying-clock failure mode), and the
    # physics gate below (MFU <= 100%).
    # symmetric best-of-REPS for BOTH points: a one-off stall in a single
    # short run would bias the slope low (over-reporting throughput)
    best_short = float("inf")
    best_dt = float("inf")
    for _ in range(REPS):
        state, dt = _timed(step, state, images, labels, ITERS_SHORT)
        best_short = min(best_short, dt)
        state, dt = _timed(step, state, images, labels, ITERS)
        best_dt = min(best_dt, dt)
    dt_short = best_short
    slope = (best_dt - dt_short) / (ITERS - ITERS_SHORT)  # s per step
    fetch_const = dt_short - ITERS_SHORT * slope
    if slope <= 0 or fetch_const < -0.15 * best_dt:
        raise RuntimeError(
            f"non-linear timing: {ITERS} iters took {best_dt:.3f}s but "
            f"{ITERS_SHORT} iters took {dt_short:.3f}s (slope {slope:.4f}s, "
            f"implied constant {fetch_const:.3f}s) — the clock is not "
            "measuring device execution")

    ms_per_step = slope * 1e3
    img_per_sec_per_chip = batch / slope / n_chips
    mfu = None
    if peak and np.isfinite(flops_per_step):
        mfu = flops_per_step / slope / (peak * n_chips)
        if mfu > 1.0:
            raise RuntimeError(
                f"benchmark reports {mfu * 100:.1f}% MFU "
                f"({flops_per_step / 1e12:.2f} TFLOP/step in {ms_per_step:.3f} "
                f"ms vs {peak / 1e12:.0f} TFLOP/s peak) — physically "
                "impossible, refusing to report")

    print(json.dumps({
        "metric": "spectre_vit_cifar100_train_images_per_sec_per_chip",
        "value": round(img_per_sec_per_chip, 1),
        "unit": "images/sec/chip",
        # like-for-like measured baseline: reference torch recipe, this host
        # CPU (benchmarks/torch_cpu_baseline.py). The >=3x-A100 BASELINE.json
        # target is unmeasured (no GPU here) — see BASELINE.md.
        "vs_baseline": round(img_per_sec_per_chip / TORCH_CPU_IMG_PER_SEC, 3),
        "baseline": "reference torch CPU (measured, 6.97 img/s); A100 target unmeasured",
        "ms_per_step": round(ms_per_step, 3),
        "batch": batch,
        "flops_per_step": flops_per_step,
        "mfu_pct": round(mfu * 100, 2) if mfu is not None else None,
        "device_kind": device_kind,
        "fetch_overhead_ms": round(fetch_const * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
