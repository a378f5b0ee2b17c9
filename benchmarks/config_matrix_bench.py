"""Per-config TPU training-step matrix (VERDICT r4 #3).

The reference's capability surface IS its config matrix
(/root/reference/spectre_vit/configs/ — vit/fnet/spectre x mnist/cifar100,
spectre_branch); until round 5 the committed TPU perf evidence covered only
the flagship ``spectre_vit_cifar100``. This harness produces one slope-timed
row per shipped config — ms/step, img/s/chip, and MFU where cost_analysis
FLOPs are meaningful — with bench.py's exact truth machinery (hard D2H sync,
two-point slope canceling the ~30 ms tunnel fetch, MFU>100% hard-fail).

Each config runs its OWN shipped geometry and its own training semantics:
the dataset-appropriate augmentation pipeline compiles into the step
(MNIST = rotation-only, CIFAR = the full flip/jitter/blur/erasing graph —
mirroring train/loop.py), block routes register when the config ships
``mix_block``. The batch is normalized to --batch (default 1024, the
flagship throughput batch) so rows compare like-for-like; batch is a
training knob, not model semantics.

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/config_matrix_bench.py
Output: one JSON line per config + a markdown table for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import time

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = [
    "vit_mnist", "vit_cifar100",
    "fnet_mnist", "fnet_cifar100",
    "spectre_vit_mnist", "spectre_vit_cifar100",
    "dwt_cifar100", "spectre_branch",
]

PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12,
    "TPU v5p": 459e12, "TPU v6 lite": 918e12,
}


def _make_augment(cfg, dataset):
    from spectre_tpu.data import make_train_augment
    from spectre_tpu.train.loop import _dataset_stats

    mean, std = _dataset_stats(dataset)
    if dataset == "mnist":
        # reference MNIST pipeline is RandomRotation(15) ONLY
        # (vit_spectre_mnist.py:117-184) — train/loop.py parity
        return make_train_augment(mean, std, hflip=False, jitter=False,
                                  grayscale_p=0.0, degrees=15.0,
                                  blur_p=0.0, erasing_p=0.0)
    return make_train_augment(mean, std, jitter=(cfg.in_channels == 3))


def bench_config(name: str, batch: int, warmup: int, iters: int):
    from spectre_tpu.configs import parse_config
    from spectre_tpu.models import build_model
    from spectre_tpu.ops.fused_mix import (clear_mix_routes,
                                           register_block_mix_routes)
    from spectre_tpu.train import (create_train_state, make_optimizer,
                                   make_train_step)

    cfg = parse_config(f"spectre_tpu/configs/{name}.py")
    shipped_batch = int(cfg.batch_size)
    cfg.batch_size = batch
    dataset = getattr(cfg, "dataset", "mnist")
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=195)
    x_init = jnp.zeros((batch, cfg.in_channels, cfg.img_size, cfg.img_size))
    state = create_train_state(model, tx, x_init, seed=0)
    clear_mix_routes()
    routes = 0
    if getattr(cfg, "mix_block", 0):
        routes = len(register_block_mix_routes(state.variables()))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, x_init.shape).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, batch)
                         .astype(np.int32))
    step = make_train_step(model, augment_fn=_make_augment(cfg, dataset))

    compiled = step.lower(state, images, labels).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))

    for _ in range(max(1, warmup)):  # >=1: the sync below needs a metric
        state, m = step(state, images, labels)
    np.asarray(m["loss"])

    def timed(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, images, labels)
        np.asarray(m["loss"])
        return time.perf_counter() - t0

    n1 = max(2, iters // 3)
    best_short, best_long = float("inf"), float("inf")
    for _ in range(2):
        best_short = min(best_short, timed(n1))
        best_long = min(best_long, timed(iters))
    slope = (best_long - best_short) / (iters - n1)
    const = best_short - n1 * slope
    if slope <= 0 or const < -0.15 * best_long:
        raise RuntimeError(f"{name}: non-linear timing "
                           f"(slope {slope:.5f}s const {const:.3f}s)")

    peak = PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
    mfu = flops / slope / peak if peak and np.isfinite(flops) else None
    if mfu is not None and mfu > 1.0:
        raise RuntimeError(f"{name}: {mfu*100:.1f}% MFU — impossible")
    row = {
        "config": name, "batch": batch, "shipped_batch": shipped_batch,
        "ms_per_step": round(slope * 1e3, 2),
        "img_per_sec_per_chip": round(batch / slope, 0),
        "mfu_pct": round(mfu * 100, 2) if mfu is not None else None,
        "tflop_per_step": round(flops / 1e12, 3),
        "block_routes": routes,
        "embed": int(cfg.embed_dim), "encoders": int(cfg.num_encoders),
        "heads": int(cfg.num_heads), "img_size": int(cfg.img_size),
        "method": getattr(cfg, "method", None),
        "model": getattr(cfg, "model", "spectre_vit"),
    }
    print(json.dumps(row), flush=True)
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--warmup", type=int, default=8)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--configs", nargs="*", default=CONFIGS)
    args = p.parse_args(argv)
    rows = []
    for name in args.configs:
        try:
            rows.append(bench_config(name, args.batch, args.warmup,
                                     args.iters))
        except Exception as e:  # keep the sweep alive; report the failure
            print(json.dumps({"config": name, "error": str(e)[:300]}),
                  flush=True)
    print("\n| config | model/method | geometry | ms/step | img/s/chip | "
          "MFU | TFLOP/step |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        geo = (f"E{r['embed']} L{r['encoders']} H{r['heads']} "
               f"{r['img_size']}px")
        mfu = f"{r['mfu_pct']:.1f}%" if r["mfu_pct"] is not None else "—"
        print(f"| {r['config']} | {r['model']}/{r['method']} | {geo} | "
              f"{r['ms_per_step']} | {r['img_per_sec_per_chip']:.0f} | "
              f"{mfu} | {r['tflop_per_step']} |")


if __name__ == "__main__":
    main()
