"""Distillation training orchestration (reference train.py:298-396).

Flow parity: frozen DINO teacher + student on the same chips, dual-view
batches (teacher view resized to the teacher's input size with teacher
normalization; student view through the student augmentation pipeline —
reference DistillationDatasetCls, distillation.py:25-43), fused
KD(T=2)*0.25 + CE*0.75 loss (train.py:334-348), per-batch
``Batch Loss/{Train,Dist,CE}`` metrics (train.py:355-359).

TPU design: ONE raw pixel batch crosses host->device; both views are computed
on device (resize + normalize are jitted). The teacher forward runs in its
own jitted program and the student forward/backward+update in another
(train/step.py make_distill_step) — split compilation keeps each program
small through the remote-compile tunnel while the two still execute
back-to-back on the same chips with no host sync between them. The reference
paid two host transform pipelines and two H2D copies per batch. Checkpoints:
orbax best-by-loss + latest under <checkpoint_dir>/distill_<name>/ckpt.
"""

from __future__ import annotations

import time
from types import SimpleNamespace

import jax
import numpy as np

from spectre_tpu.data import (
    BatchIterator,
    load_dataset,
    make_train_augment,
    prefetch_to_mesh,
)
from spectre_tpu.data.augment import normalize, resize_bilinear
from spectre_tpu.distill.teacher import load_teacher
from spectre_tpu.models import build_model, example_input
from spectre_tpu.parallel import create_mesh, replicated_sharding
from spectre_tpu.train.checkpoint import CheckpointManager
from spectre_tpu.train.loop import _dataset_stats
from spectre_tpu.train.optim import make_optimizer
from spectre_tpu.train.state import create_train_state
from spectre_tpu.train.step import make_distill_step
from spectre_tpu.utils import MetricsWriter, experiment_name

# ImageNet stats — what DINO teachers were trained with
_TEACHER_MEAN = (0.485, 0.456, 0.406)
_TEACHER_STD = (0.229, 0.224, 0.225)


def distill_from_config(
    config: SimpleNamespace,
    *,
    max_steps: int | None = None,
    synthetic: bool = False,
    teacher=None,
    teacher_variables=None,
    teacher_img_size: int = 224,
    write_metrics: bool = True,
    checkpoint: bool = True,
):
    dataset = getattr(config, "dataset", "cifar100")
    if synthetic:
        # hermetic: bypass the on-disk search entirely (a bogus data_dir
        # sentinel would fall through to $SPECTRE_DATA_DIR / ./data)
        from spectre_tpu.data.datasets import _synthetic

        train_x, train_y = _synthetic(dataset, "train")
    else:
        train_x, train_y = load_dataset(dataset, "train",
                                        data_dir=getattr(config, "data_dir", None))

    mesh = create_mesh()
    batch_size = int(config.batch_size)
    if batch_size < mesh.devices.shape[0]:
        raise ValueError(
            f"batch_size={batch_size} is smaller than the device count "
            f"{mesh.devices.shape[0]}")
    batch_size -= batch_size % mesh.devices.shape[0]
    if batch_size > len(train_x):
        raise ValueError(
            f"batch_size={batch_size} exceeds the train set ({len(train_x)} "
            "examples) — the drop-last iterator would yield zero batches")

    student = build_model(config)
    if teacher is None:
        # "dinov3_*" teacher names select the RoPE variant (the reference's
        # actual teacher, train.py:66-74); "dinov2_*" the learned-pos-embed one
        variant = "v2" if str(getattr(config, "teacher", "dinov3_vits16")
                              ).startswith("dinov2") else "v3"
        from spectre_tpu.models.registry import _DTYPES

        teacher, teacher_variables = load_teacher(
            config.num_classes, img_size=teacher_img_size,
            seed=getattr(config, "random_seed", 42), variant=variant,
            weights_path=getattr(config, "teacher_checkpoint", None),
            # frozen + inference-only: run at the config's compute dtype
            dtype=_DTYPES[getattr(config, "compute_dtype", "float32")])

    train_iter = BatchIterator(train_x, train_y, batch_size, shuffle=True,
                               seed=getattr(config, "random_seed", 42))
    steps_per_epoch = max(1, len(train_iter))
    tx = make_optimizer(config, steps_per_epoch)
    state = create_train_state(student, tx,
                               example_input(config, batch_size=batch_size),
                               seed=getattr(config, "random_seed", 42))
    state = jax.device_put(state, replicated_sharding(mesh))

    mean, std = _dataset_stats(dataset)
    in_ch = int(getattr(config, "in_channels", 3))
    augment = make_train_augment(mean, std, jitter=(in_ch == 3))

    t_size = teacher.backbone.img_size

    @jax.jit
    def teacher_view(x):
        # dual-view: upsample raw pixels to the teacher resolution + teacher
        # normalization (reference resizes the teacher path only, train.py:92-99)
        x = resize_bilinear(x, t_size)
        if in_ch == 1:
            x = x.repeat(3, axis=1)
        return normalize(x, _TEACHER_MEAN, _TEACHER_STD)

    @jax.jit
    def teacher_apply(images_teacher):
        return teacher.apply(teacher_variables, images_teacher)

    alpha = float(getattr(config, "distill_alpha", 0.25))
    step_fn = make_distill_step(
        student,
        temperature=float(getattr(config, "distill_temperature", 2.0)),
        kd_weight=alpha, ce_weight=1.0 - alpha,
    )

    img_size = int(config.img_size)
    if train_x.shape[-1] != img_size:
        resize = jax.jit(lambda v: resize_bilinear(v, img_size))
    else:
        resize = lambda v: v  # noqa: E731

    name = "distill_" + experiment_name(config)
    logdir = f"{getattr(config, 'checkpoint_dir', 'runs')}/{name}"
    writer = MetricsWriter(logdir) if write_metrics else None
    ckpt = CheckpointManager(
        f"{logdir}/ckpt", max_to_keep=getattr(config, "keep_checkpoints", 3),
        best_metric="neg_loss") if checkpoint else None

    aug_key = jax.random.key(getattr(config, "random_seed", 42) + 2)
    total_steps = 0
    t0 = time.time()
    done = False
    metrics = None
    log_every = int(getattr(config, "log_every", 50))
    for epoch in range(int(config.epochs)):
        if done:
            break
        pending = []  # device metrics, fetched in one batched D2H per window
        for batch in prefetch_to_mesh(train_iter, mesh):
            raw = batch["image"]
            aug_key, k = jax.random.split(aug_key)
            img_student = augment(k, resize(raw))
            teacher_logits = teacher_apply(teacher_view(raw))
            state, metrics = step_fn(state, img_student, teacher_logits,
                                     batch["label"])
            total_steps += 1
            pending.append((total_steps, metrics))
            # a per-step device_get would serialize dispatch (host blocks on
            # every step's completion, defeating the prefetch overlap); the
            # reference logged per batch (train.py:355-359) — keep the
            # scalars, batch the syncs
            if writer and len(pending) >= log_every:
                for step_no, m in jax.device_get(pending):
                    writer.scalar("Batch Loss/Train", m["loss"], step_no)
                    writer.scalar("Batch Loss/Dist", m["loss_dist"], step_no)
                    writer.scalar("Batch Loss/CE", m["loss_ce"], step_no)
                pending = []
            if max_steps is not None and total_steps >= max_steps:
                done = True
                break
        if writer and pending:
            for step_no, m in jax.device_get(pending):
                writer.scalar("Batch Loss/Train", m["loss"], step_no)
                writer.scalar("Batch Loss/Dist", m["loss_dist"], step_no)
                writer.scalar("Batch Loss/CE", m["loss_ce"], step_no)
            pending = []
        if ckpt and metrics is not None:
            ckpt.save(state, {"neg_loss": -float(jax.device_get(metrics)["loss"])})
    if metrics is None:
        raise RuntimeError("no training batches ran (empty dataset or "
                           "epochs=0) — nothing to return")
    if ckpt:
        ckpt.wait()
        ckpt.close()
    if writer:
        writer.scalar("Training time", time.time() - t0, total_steps)
        writer.close()
    return state, jax.device_get(metrics)
