"""Config-driven training orchestration.

The TPU-native counterpart of the reference training driver (train.py:208-295):
one compiled train step over a data-parallel mesh, device-side augmentation,
double-buffered prefetch, per-epoch validation, TensorBoard-named metrics,
orbax best+latest checkpoints, and exact resume. Also reports the north-star
perf metrics (steps/sec, images/sec/chip) the reference never measured.
"""

from __future__ import annotations

import functools
import itertools
import signal
import time
from dataclasses import dataclass
from types import SimpleNamespace
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.data import (
    CIFAR100_MEAN,
    CIFAR100_STD,
    MNIST_MEAN,
    MNIST_STD,
    BatchIterator,
    load_dataset,
    make_eval_transform,
    make_train_augment,
    prefetch_to_mesh,
)
from spectre_tpu.models import build_model, example_input
from spectre_tpu.parallel import (
    SPECTRE_TP_RULES,
    VIT_TP_RULES,
    apply_tp,
    create_mesh,
    replicated_sharding,
)
from spectre_tpu.train.checkpoint import CheckpointManager
from spectre_tpu.train.optim import make_optimizer
from spectre_tpu.train.state import create_train_state, param_count
from spectre_tpu.train.step import make_eval_step, make_train_step
from spectre_tpu.utils import MetricsWriter, experiment_name

_STATS = {
    "cifar100": (CIFAR100_MEAN, CIFAR100_STD),
    "mnist": (MNIST_MEAN, MNIST_STD),
}


@dataclass
class TrainResult:
    state: object
    best_val_accuracy: float
    last_val_accuracy: float
    steps_per_sec: float
    images_per_sec_per_chip: float
    logdir: str


def _dataset_stats(name: str):
    return _STATS.get(name, ((0.5,), (0.5,)))


@functools.lru_cache(maxsize=None)
def _resizer(img_size: int):
    """One jitted resize per target size (a fresh closure per call would
    retrace every invocation)."""
    return jax.jit(lambda v: jax.image.resize(
        v, (v.shape[0], v.shape[1], img_size, img_size), method="bilinear"))


def _resize_to(img_size: int, *arrays):
    """Resize NCHW arrays to the model's input size (the reference resizes
    through torchvision transforms, train.py:92-99). No-op when they match."""
    out = []
    for a in arrays:
        if a.shape[-1] != img_size or a.shape[-2] != img_size:
            a = np.asarray(_resizer(img_size)(a))
        out.append(a)
    return out if len(out) > 1 else out[0]


def load_sized_dataset(config, split: str, synthetic: bool = False):
    """Dataset loading + model-input-size resize, shared by train/eval/export.

    ``synthetic=True`` is HERMETIC: it bypasses the on-disk search entirely
    (a "/nonexistent" data_dir sentinel would still fall through to
    $SPECTRE_DATA_DIR / ./data and silently train on real data)."""
    dataset = getattr(config, "dataset", "mnist")
    if synthetic:
        from spectre_tpu.data.datasets import _synthetic

        x, y = _synthetic(dataset, split)
    else:
        x, y = load_dataset(dataset, split,
                            data_dir=getattr(config, "data_dir", None))
    return _resize_to(int(config.img_size), x), y


def train_from_config(
    config: SimpleNamespace,
    *,
    max_steps: int | None = None,
    synthetic: bool = False,
    resume: bool = False,
    write_metrics: bool = True,
    checkpoint: bool = True,
    augment_fn: Callable | None = None,
) -> TrainResult:
    """Train the configured model end-to-end. ``max_steps`` caps total steps
    (smoke mode); ``synthetic`` forces the hermetic synthetic dataset."""
    dataset = getattr(config, "dataset", "mnist")
    train_x, train_y = load_sized_dataset(config, "train", synthetic)
    val_x, val_y = load_sized_dataset(config, "test", synthetic)

    model_parallel = int(getattr(config, "model_parallel", 1))
    mesh = create_mesh(model_parallel=model_parallel)
    n_chips = int(np.prod(mesh.devices.shape))
    batch_size = int(config.batch_size)
    if batch_size < mesh.devices.shape[0]:
        raise ValueError(
            f"batch_size={batch_size} is smaller than the data-parallel "
            f"device count {mesh.devices.shape[0]} — every device needs at "
            "least one sample per step")
    # static per-step shapes: batch must divide over the data axis
    batch_size -= batch_size % mesh.devices.shape[0]

    # multi-host: each process loads/iterates ITS strided slice of the data
    # and stages local batches of global_batch/P; equal per-process batch
    # COUNTS are mandatory (a straggler process would deadlock the
    # collectives), hence the truncation to the minimum slice length
    pcount, pidx = jax.process_count(), jax.process_index()
    is_main = pidx == 0
    local_batch = batch_size
    if pcount > 1:
        n_tr = len(train_x) // pcount
        train_x, train_y = train_x[pidx::pcount][:n_tr], train_y[pidx::pcount][:n_tr]
        n_va = len(val_x) // pcount
        val_x, val_y = val_x[pidx::pcount][:n_va], val_y[pidx::pcount][:n_va]
        local_batch = batch_size // pcount

    model = build_model(config)
    train_iter = BatchIterator(train_x, train_y, local_batch, shuffle=True,
                               seed=getattr(config, "random_seed", 42))
    steps_per_epoch = max(1, len(train_iter))
    tx = make_optimizer(config, steps_per_epoch)
    state = create_train_state(
        model, tx, example_input(config, batch_size=batch_size),
        seed=getattr(config, "random_seed", 42),
    )
    rules = VIT_TP_RULES if getattr(config, "model", "") == "vit" \
        else SPECTRE_TP_RULES
    fsdp = bool(getattr(config, "fsdp", False))
    if fsdp:
        # FSDP/ZeRO-3: params + AdamW moments sharded over the data axis
        # (composed with the TP rules when a model axis exists); the step is
        # re-jitted below with these shardings pinned (parallel/fsdp.py).
        # Works across processes too: every process holds the identical
        # seeded init, and apply_fsdp builds the global sharded arrays from
        # per-host slices of that copy (fsdp._put).
        from spectre_tpu.parallel import apply_fsdp
        from spectre_tpu.parallel.fsdp import MIN_SHARD_SIZE

        state = apply_fsdp(
            state, mesh,
            min_size=int(getattr(config, "fsdp_min_size", MIN_SHARD_SIZE)),
            tp_rules=rules if model_parallel > 1 else None)
    elif model_parallel > 1:
        # tensor parallelism: GSPMD sharding rules by model family
        state = apply_tp(state, mesh, rules)
    elif pcount == 1:
        # replicate params/opt over the mesh; batches arrive data-sharded
        state = jax.device_put(state, replicated_sharding(mesh))
    # (multi-process: identical seeded init on every process; GSPMD treats
    # the process-local state as replicated — tests/test_multihost.py)
    n_params = param_count(state.params)

    mean, std = _dataset_stats(dataset)
    if augment_fn is not None:
        augment = augment_fn
    elif dataset == "mnist":
        # reference MNIST pipeline is RandomRotation(15) ONLY
        # (vit_spectre_mnist.py:117-184) — no flip/jitter/blur/erasing
        augment = make_train_augment(mean, std, hflip=False, jitter=False,
                                     grayscale_p=0.0, degrees=15.0,
                                     blur_p=0.0, erasing_p=0.0)
    else:
        augment = make_train_augment(mean, std,
                                     jitter=(train_x.shape[1] == 3))
    eval_transform = make_eval_transform(mean, std)

    # augmentation is compiled INTO the train step: one dispatch per step,
    # raw pixels cross the host boundary, keys derive from the state PRNG
    # shard_local_augment (opt-in, multi-chip): run the augmentation under
    # shard_map over the data axis — removes the pixel-source all-gather
    # GSPMD inserts for the flat rotation index (parallel/audit.py) at the
    # cost of augmentation draws becoming mesh-layout-dependent (per-shard
    # key folding), which is why it is NOT the default: cross-layout loss
    # parity (dryrun legs, multihost determinism tests) relies on
    # layout-invariant draws, and the gather is 12.6 MB over ICI at B=1024.
    train_step = make_train_step(
        model, augment_fn=augment,
        grad_accum_steps=int(getattr(config, "grad_accum_steps", 1)),
        mesh=(mesh if bool(getattr(config, "shard_local_augment", False))
              else None),
        fast_rng=bool(getattr(config, "fast_rng", True)))
    if fsdp:
        # pin the carried state's FSDP shardings on the step's output —
        # GSPMD's free propagation drifts sharded params back to replicated
        # after the first update (measured; parallel/fsdp.py)
        from spectre_tpu.parallel import pin_step_shardings

        train_step = pin_step_shardings(train_step, state)
    eval_step = make_eval_step(model)

    name = experiment_name(config)
    logdir = f"{getattr(config, 'checkpoint_dir', 'runs')}/{name}"
    writer = MetricsWriter(logdir) if (write_metrics and is_main) else None
    ckpt = CheckpointManager(f"{logdir}/ckpt",
                             max_to_keep=getattr(config, "keep_checkpoints", 3)) if checkpoint else None
    if resume and ckpt and ckpt.latest_step is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")

    if getattr(config, "mix_routed", False):
        # Clos-routed mix backward (ops/routing.py): factor the LIVE
        # permutation buffers (post-restore) into route tables so the jitted
        # step's backward uses MXU routing instead of the row gather
        from spectre_tpu.ops.fused_mix import register_mix_routes

        # impl default "mxu": the fused Pallas route kernel is blocked by a
        # Mosaic unroll compiler cliff at the flagship factorization
        # (benchmarks/routed_kernel_diag.py) — opt into it per-shape only
        keys = register_mix_routes(
            state.variables(),
            impl=getattr(config, "mix_routed_impl", "mxu"))
        if is_main and keys:
            print(f"mix routes registered: {len(keys)}")
    elif getattr(config, "mix_block", 0):
        # block-structured permutations (config mix_block >= 8): register
        # the full-bandwidth Pallas block-DMA backward for the LIVE buffers
        # (mesh-aware: on multi-device meshes the backward shard_maps the
        # kernel over the batch axis)
        from spectre_tpu.ops.fused_mix import register_block_mix_routes

        keys = register_block_mix_routes(state.variables(), mesh=mesh)
        if is_main and keys:
            print(f"block mix routes registered: {len(keys)}")
    else:
        # a previous model in this process may have registered routes under
        # the same scope paths; never let them leak into this run's backward
        from spectre_tpu.ops.fused_mix import clear_mix_routes

        clear_mix_routes()

    if is_main:
        print(f"model={getattr(config, 'model', '?')} params={n_params:,} "
              f"chips={n_chips} procs={pcount} batch={batch_size} "
              f"steps/epoch={steps_per_epoch}")

    # preemption-aware save (SURVEY.md §5.3: the reference has no failure
    # recovery): on SIGTERM/SIGINT finish the current step, checkpoint the
    # full state, then stop — resume picks up exactly where training stopped.
    preempted = {"flag": False}

    def _on_signal(signum, frame):
        preempted["flag"] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:  # not the main thread (tests)
            pass

    best_val = -1.0
    last_val = -1.0
    # resume continues the epoch count from the restored step (running the
    # full config.epochs AGAIN would overtrain past the cosine schedule);
    # fast-forward the shuffle stream past completed epochs and skip the
    # interrupted epoch's already-trained prefix so a MID-epoch restore
    # (the preemption case) neither retrains those batches nor runs past
    # the end of the cosine schedule (aug keys are fold_in(rng, step) in
    # train/step.py — exact at any step by construction)
    start_epoch = int(state.step) // steps_per_epoch
    skip_batches = int(state.step) % steps_per_epoch
    for _ in range(start_epoch):
        train_iter.skip_epoch()
    total_steps = int(state.step)
    t_train0 = time.time()
    images_seen = 0
    epochs = int(config.epochs)
    log_every = int(getattr(config, "log_every", 50))
    done = False

    # val batch is GLOBAL like the train batch: divide across processes
    # (each process stages its slice; the assembled eval batch must not be
    # P x the configured size)
    val_local_batch = max(1, int(getattr(config, "val_batch_size",
                                         batch_size)) // pcount)
    val_iter_builder = lambda: BatchIterator(  # noqa: E731
        val_x, val_y, val_local_batch, shuffle=False)

    for epoch in range(start_epoch, epochs):
        if done:
            break
        epoch_metrics = []
        src = iter(train_iter)
        if skip_batches:
            src = itertools.islice(src, skip_batches, None)
            skip_batches = 0
        for batch in prefetch_to_mesh(src, mesh,
                                      prefetch=int(getattr(config, "prefetch_depth", 2))):
            state, metrics = train_step(state, batch["image"], batch["label"])
            epoch_metrics.append(metrics)
            total_steps += 1
            images_seen += batch_size
            if writer and total_steps % log_every == 0:
                m = jax.device_get(metrics)
                writer.scalar("Loss/Train", m["loss"], total_steps)
                writer.scalar("Accuracy/Train", m["accuracy"], total_steps)
            if preempted["flag"] or (max_steps is not None and total_steps >= max_steps):
                done = True
                break

        if preempted["flag"]:
            # skip the epoch tail (full val pass + writer sync): a SIGTERM
            # grace window must go to the checkpoint save below, not to an
            # eval sweep — otherwise SIGKILL lands mid-eval and the run
            # loses everything since the last epoch-end checkpoint
            break

        # one host sync per epoch (the reference synced every batch)
        ems = jax.device_get(epoch_metrics)
        tr_loss = float(np.mean([m["loss"] for m in ems]))
        tr_acc = float(np.mean([m["accuracy"] for m in ems]))

        # validation: accumulate sums ON DEVICE, one D2H sync per epoch
        # (round 1 device_get'd every val batch — a host stall per batch)
        dev_sums = None
        for batch in prefetch_to_mesh(val_iter_builder(), mesh):
            images = eval_transform(batch["image"])
            out = eval_step(state.params, state.buffers, images, batch["label"],
                            batch["mask"])
            if pcount > 1:
                # serialize independent eval_step launches across processes:
                # overlapped in-flight executions of the same program can
                # mismatch the cross-process reduce's collective rendezvous
                # (eval#i on one process pairing with eval#j on another) and
                # deadlock — see the identical guard + incident note in
                # distill/loop.py. One sync per val batch, per epoch.
                out = jax.block_until_ready(out)
            dev_sums = out if dev_sums is None else jax.tree.map(
                jnp.add, dev_sums, out)
        sums = (jax.device_get(dev_sums) if dev_sums is not None
                else {"loss_sum": 0.0, "correct": 0.0, "count": 0.0})
        val_loss = float(sums["loss_sum"]) / max(float(sums["count"]), 1)
        val_acc = float(sums["correct"]) / max(float(sums["count"]), 1)
        last_val = val_acc
        best_val = max(best_val, val_acc)

        if writer:
            writer.scalar("Loss/Validation", val_loss, total_steps)
            writer.scalar("Accuracy/Validation", val_acc, total_steps)
            elapsed = time.time() - t_train0
            writer.scalar("Perf/steps_per_sec", total_steps / elapsed, total_steps)
            writer.scalar("Perf/images_per_sec_per_chip",
                          images_seen / elapsed / n_chips, total_steps)
            writer.flush()
        if ckpt:
            ckpt.save(state, {"accuracy": val_acc, "loss": val_loss})
        if is_main:
            print(f"epoch {epoch + 1}/{epochs} step {total_steps} "
                  f"train loss {tr_loss:.4f} acc {tr_acc:.4f} | "
                  f"val loss {val_loss:.4f} acc {val_acc:.4f}")

    elapsed = time.time() - t_train0
    if writer:
        writer.scalar("Training time", elapsed, total_steps)  # train.py:292-295
        writer.close()
    if ckpt:
        if preempted["flag"]:
            ckpt.save(state, {"accuracy": last_val})
            print(f"preempted at step {total_steps}: state checkpointed, "
                  "resume with --resume")
        ckpt.wait()
        ckpt.close()
    for sig, handler in prev_handlers.items():
        signal.signal(sig, handler)
    return TrainResult(
        state=state,
        best_val_accuracy=float(best_val),
        last_val_accuracy=float(last_val),
        steps_per_sec=total_steps / elapsed if elapsed > 0 else 0.0,
        images_per_sec_per_chip=images_seen / elapsed / n_chips if elapsed > 0 else 0.0,
        logdir=logdir,
    )
