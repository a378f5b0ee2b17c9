"""Distillation step throughput on TPU: teacher fwd + dual views + student step.

Times the exact per-batch work of the distillation loop
(spectre_tpu/distill/loop.py): device-side augmentation of the student view,
bilinear upsample + normalize for the teacher view, the frozen DINOv3-style
RoPE teacher forward at 224x224, and the student fwd+bwd+AdamW update with
the fused KD(T=2)*0.25 + CE*0.75 loss. Teacher weights are random (no real
checkpoint in this environment) — throughput is architecture-dependent, not
weight-dependent.

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/distill_step_bench.py [batch]
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

from spectre_tpu.configs import parse_config
from spectre_tpu.distill.loop import _TEACHER_MEAN, _TEACHER_STD
from spectre_tpu.distill.teacher import load_teacher
from spectre_tpu.data import (CIFAR100_MEAN, CIFAR100_STD,
                              make_train_augment, normalize)
from spectre_tpu.data.augment import resize_bilinear
from spectre_tpu.models import build_model, example_input
from spectre_tpu.train import create_train_state, make_optimizer
from spectre_tpu.train.step import make_distill_step


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = parse_config("spectre_tpu/configs/distill_cifar100.py")
    cfg.batch_size = batch
    student = build_model(cfg)
    from spectre_tpu.models.registry import resolve_dtype
    teacher, tvars = load_teacher(
        cfg.num_classes, img_size=224, seed=0, variant="v3",
        dtype=resolve_dtype(getattr(cfg, "compute_dtype", "float32")))
    tx = make_optimizer(cfg, 195)
    state = create_train_state(student, tx, example_input(cfg, batch), seed=0)
    # mirror the distill loop's route registration (distill/loop.py): the
    # config's block-structured tables (mix_block, inherited from the
    # flagship base) run the Pallas block-DMA backward only when registered
    if getattr(cfg, "mix_block", 0):
        from spectre_tpu.ops.fused_mix import register_block_mix_routes

        keys = register_block_mix_routes(state.variables())
        print(f"block mix routes registered: {len(keys)}")
    augment = make_train_augment(CIFAR100_MEAN, CIFAR100_STD)
    step_fn = make_distill_step(student, temperature=2.0, kd_weight=0.25,
                                ce_weight=0.75)
    t_size = teacher.backbone.img_size

    @jax.jit
    def one_batch_teacher(raw):
        tv = normalize(resize_bilinear(raw, t_size), _TEACHER_MEAN,
                       _TEACHER_STD)
        return teacher.apply(tvars, tv)

    rng = np.random.default_rng(0)
    raw = jax.numpy.asarray(
        rng.uniform(0, 1, (batch, 3, cfg.img_size, cfg.img_size))
        .astype(np.float32))
    labels = jax.numpy.asarray(rng.integers(0, cfg.num_classes, batch)
                               .astype(np.int32))
    key = jax.random.key(0)

    cached_tl = one_batch_teacher(raw)  # frozen-teacher cache stand-in

    def one_step_recompute(state, key):
        key, k = jax.random.split(key)
        img = augment(k, raw)
        tl = one_batch_teacher(raw)
        state, m = step_fn(state, img, tl, labels)
        return state, key, m

    def one_step_cached(state, key):
        # the distill loop's default path: teacher logits come from the
        # per-run cache (distill/loop.py precompute_teacher_logits); the
        # per-step work is augmentation + the student program only
        key, k = jax.random.split(key)
        img = augment(k, raw)
        state, m = step_fn(state, img, cached_tl, labels)
        return state, key, m

    def time_mode(label, one_step, state, key):
        for _ in range(5):
            state, key, m = one_step(state, key)
        np.asarray(m["loss"])
        points = (10, 30)
        times = []
        for iters in points:
            t0 = time.perf_counter()
            for _ in range(iters):
                state, key, m = one_step(state, key)
            np.asarray(m["loss"])
            times.append(time.perf_counter() - t0)
        slope = (times[1] - times[0]) / (points[1] - points[0])
        print(f"batch {batch} [{label}]: {slope * 1e3:.1f} ms/step "
              f"({batch / slope:.0f} img/s/chip)")
        return state, key, slope

    print("teacher 224x224 RoPE ViT-S/16 + student flagship, fused KD+CE")
    state, key, s_re = time_mode("per-step teacher recompute",
                                 one_step_recompute, state, key)
    state, key, s_ca = time_mode("cached teacher logits (loop default)",
                                 one_step_cached, state, key)
    n_train = 50_000
    teacher_cost = max(0.0, s_re - s_ca)  # per-batch teacher-side seconds
    total_steps = max(1, int(cfg.epochs) * (n_train // batch))
    amort = s_ca + (n_train / batch) * teacher_cost / total_steps
    print(f"cache speedup {s_re / s_ca:.2f}x per step; amortized over "
          f"{cfg.epochs} epochs (one teacher precompute pass): "
          f"{amort * 1e3:.1f} ms/step effective")


if __name__ == "__main__":
    main()
