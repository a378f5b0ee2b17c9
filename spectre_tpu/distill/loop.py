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
paid two host transform pipelines and two H2D copies per batch.

Frozen-teacher logit cache (default ON): the teacher view is DETERMINISTIC —
``resize_bilinear`` + normalize of the raw batch, no augmentation — and the
teacher is frozen, so each sample's teacher logits are constant across every
epoch. One jitted pass over the dataset at startup (~1 epoch of teacher
time, ~20 MB host memory for 50k x 100 classes) replaces the per-step
teacher forward for the whole run; each batch then joins the cache by sample
index and ships the logits with the pixels. The loss sequence is identical
to per-step recompute (tests/test_distill.py::test_teacher_cache_parity);
``distill_cache_teacher=False`` (config) or ``cache_teacher=False`` keeps
the per-step recompute path for future stochastic teacher views. The
reference recomputed the frozen teacher every batch, every epoch
(train.py:326-327).

Failure recovery mirrors the train loop (train/loop.py): orbax best+latest
checkpoints, ``resume=True`` continues from the latest step (epoch count
derived from the restored step), SIGTERM/SIGINT trigger a
finish-step-then-checkpoint preemption save. Multi-host: each process
feeds its strided slice of the data at ``batch/process_count`` and metrics
write on process 0 only.
"""

from __future__ import annotations

import itertools
import signal
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.data import (
    BatchIterator,
    load_dataset,
    make_eval_transform,
    make_train_augment,
    prefetch_to_mesh,
)
from spectre_tpu.data.augment import (
    center_crop,
    normalize,
    resize_bicubic_pil,
    resize_bilinear,
)
from spectre_tpu.distill.teacher import load_teacher
from spectre_tpu.models import build_model, example_input
from spectre_tpu.models.registry import resolve_dtype
from spectre_tpu.parallel import create_mesh, replicated_sharding
from spectre_tpu.train.checkpoint import CheckpointManager
from spectre_tpu.train.loop import _dataset_stats, load_sized_dataset
from spectre_tpu.train.optim import make_optimizer
from spectre_tpu.train.state import create_train_state
from spectre_tpu.train.step import make_distill_step, make_eval_step
from spectre_tpu.utils import MetricsWriter, experiment_name

# ImageNet stats — what DINO teachers were trained with
_TEACHER_MEAN = (0.485, 0.456, 0.406)
_TEACHER_STD = (0.229, 0.224, 0.225)
# the reference recipe's transform_dino normalize constants (CIFAR-100
# stats — /root/reference/spectre_vit/repl/train.py:95-97)
_REFERENCE_VIEW_MEAN = (0.5071, 0.4867, 0.4408)
_REFERENCE_VIEW_STD = (0.2675, 0.2565, 0.2761)


def make_teacher_view(t_size: int, in_ch: int = 3,
                      mode: str = "imagenet"):
    """Build the device-side teacher-view transform (config ``teacher_view``).

    ``mode="imagenet"`` (DEFAULT — documented divergence, PARITY.md): direct
    bilinear resize to the teacher's input size + ImageNet normalization,
    the statistics DINO teachers were trained with (the reference feeding a
    DINOv3 backbone CIFAR-statistics-normalized pixels is arguably a recipe
    bug).

    ``mode="reference"``: the reference's exact ``transform_dino`` semantics
    (/root/reference/spectre_vit/repl/train.py:91-97) — BICUBIC resize of
    the short side to ``8/7 * t_size`` (256 for the 224 teacher),
    ``CenterCrop(t_size)``, normalize with the recipe's CIFAR-100
    constants. The resize is ``data/augment.py::resize_bicubic_pil`` —
    separable GEMMs in PIL's pass order with PIL's per-pass [0, 1] clamp
    (rationale + measurements in its docstring); match vs PIL is within
    ~1 uint8 level. Oracle-tested against PIL directly — the very engine
    torchvision's Compose delegates PIL-image Resize/CenterCrop to — in
    tests/test_distill.py::test_reference_teacher_view_matches_pil_oracle.
    Square inputs only (the recipe's aspect-preserving short-side resize is
    refused, not approximated).
    """
    if mode not in ("imagenet", "reference"):
        raise ValueError(f"teacher_view must be 'imagenet' or 'reference', "
                         f"got {mode!r}")

    def view(x):
        if mode == "reference":
            pre = round(t_size * 256 / 224)
            H, W = x.shape[-2:]
            if H != W:
                # torchvision Resize(int) scales the SHORT side preserving
                # aspect; this separable implementation covers the square
                # inputs the recipe actually feeds (CIFAR 32x32). Refuse
                # rather than silently warp non-square inputs differently
                # from the recipe.
                raise ValueError(
                    f"teacher_view='reference' supports square inputs only "
                    f"(got {H}x{W}); the recipe's Resize(short_side) "
                    f"aspect-preserving path is not implemented")
            x = resize_bicubic_pil(x, pre)
            x = center_crop(x, t_size)
            mean, std = _REFERENCE_VIEW_MEAN, _REFERENCE_VIEW_STD
        else:
            x = resize_bilinear(x, t_size)
            mean, std = _TEACHER_MEAN, _TEACHER_STD
        if in_ch == 1:
            # grayscale -> RGB after the (per-channel) resize: 3x cheaper
            x = x.repeat(3, axis=1)
        return normalize(x, mean, std)

    return jax.jit(view)


def precompute_teacher_logits(teacher_logits_fn, images: np.ndarray,
                              batch_size: int, num_classes: int,
                              place=None) -> np.ndarray:
    """One jitted teacher pass over ``images`` -> [N, num_classes] float32.

    Chunks at ``batch_size`` (the same compiled program the recompute path
    would use — no extra compilation, and per-sample results are identical
    because every op in the teacher view/forward is independent across the
    batch row axis). The last partial chunk is padded to keep shapes static.

    ``place`` stages each chunk exactly like the hot loop stages its batches
    (mesh-sharded ``device_put``). This is NOT an optimization: an unsharded
    chunk makes XLA compile a different (single-device) teacher executable
    whose reductions can round differently at the last ulp, breaking the
    cached == recomputed bitwise guarantee the parity tests pin.
    """
    if place is None:
        place = jnp.asarray
    n = len(images)
    out = np.empty((n, num_classes), np.float32)
    for start in range(0, n, batch_size):
        chunk = images[start:start + batch_size]
        valid = len(chunk)
        if valid < batch_size:
            pad = np.repeat(chunk[-1:], batch_size - valid, axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        logits = teacher_logits_fn(place(np.ascontiguousarray(chunk)))
        out[start:start + valid] = np.asarray(
            logits[:valid], dtype=np.float32)
    return out


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
    resume: bool = False,
    cache_teacher: bool | None = None,
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
    # student validation set at the model input size (reference evaluated the
    # student per epoch in its main loop; the distill phase now does too)
    val_x, val_y = load_sized_dataset(config, "test", synthetic)

    mesh = create_mesh()
    batch_size = int(config.batch_size)
    if batch_size < mesh.devices.shape[0]:
        raise ValueError(
            f"batch_size={batch_size} is smaller than the device count "
            f"{mesh.devices.shape[0]}")
    batch_size -= batch_size % mesh.devices.shape[0]

    # multi-host: each process loads/iterates ITS strided slice and stages
    # local batches of global_batch/P (mirrors train/loop.py:136-144); the
    # teacher-logit cache below is likewise per-process — each process only
    # ever joins indices from its own slice
    pcount, pidx = jax.process_count(), jax.process_index()
    is_main = pidx == 0
    local_batch = batch_size
    if pcount > 1:
        n_tr = len(train_x) // pcount
        train_x, train_y = train_x[pidx::pcount][:n_tr], train_y[pidx::pcount][:n_tr]
        n_va = len(val_x) // pcount
        val_x, val_y = val_x[pidx::pcount][:n_va], val_y[pidx::pcount][:n_va]
        local_batch = batch_size // pcount
    if local_batch > len(train_x):
        raise ValueError(
            f"local batch {local_batch} exceeds the per-process train slice "
            f"({len(train_x)} examples) — the drop-last iterator would yield "
            "zero batches")

    student = build_model(config)
    if teacher is None:
        # "dinov3_*" teacher names select the RoPE variant (the reference's
        # actual teacher, train.py:66-74); "dinov2_*" the learned-pos-embed one
        variant = "v2" if str(getattr(config, "teacher", "dinov3_vits16")
                              ).startswith("dinov2") else "v3"
        teacher, teacher_variables = load_teacher(
            config.num_classes, img_size=teacher_img_size,
            seed=getattr(config, "random_seed", 42), variant=variant,
            weights_path=getattr(config, "teacher_checkpoint", None),
            # frozen + inference-only: run at the config's compute dtype
            dtype=resolve_dtype(getattr(config, "compute_dtype", "float32")))

    train_iter = BatchIterator(train_x, train_y, local_batch, shuffle=True,
                               seed=getattr(config, "random_seed", 42))
    steps_per_epoch = max(1, len(train_iter))
    tx = make_optimizer(config, steps_per_epoch)
    state = create_train_state(student, tx,
                               example_input(config, batch_size=batch_size),
                               seed=getattr(config, "random_seed", 42))
    fsdp = bool(getattr(config, "fsdp", False))
    if fsdp:
        # FSDP/ZeRO-3 for the STUDENT state (params + AdamW moments over the
        # data axis — parallel/fsdp.py; works across processes via fsdp._put).
        # The frozen teacher stays replicated on purpose: it carries no
        # optimizer moments, so sharding it saves little and adds per-step
        # all-gathers to an inference-only pass.
        from spectre_tpu.parallel import apply_fsdp
        from spectre_tpu.parallel.fsdp import MIN_SHARD_SIZE

        state = apply_fsdp(
            state, mesh,
            min_size=int(getattr(config, "fsdp_min_size", MIN_SHARD_SIZE)))
    elif pcount == 1:
        state = jax.device_put(state, replicated_sharding(mesh))
    # (multi-process: identical seeded init on every process; GSPMD treats
    # the process-local state as replicated — tests/test_multihost.py)

    mean, std = _dataset_stats(dataset)
    in_ch = int(getattr(config, "in_channels", 3))
    augment = make_train_augment(mean, std, jitter=(in_ch == 3))
    eval_transform = make_eval_transform(mean, std)

    t_size = teacher.backbone.img_size

    # dual-view: upsample raw pixels to the teacher resolution + teacher
    # normalization (reference resizes the teacher path only, train.py:92-99);
    # config.teacher_view selects imagenet (default) vs the recipe-exact
    # reference transform_dino — see make_teacher_view
    teacher_view = make_teacher_view(
        t_size, in_ch=in_ch,
        mode=str(getattr(config, "teacher_view", "imagenet")))

    @jax.jit
    def teacher_logits_fn(raw):
        return teacher.apply(teacher_variables, teacher_view(raw))

    alpha = float(getattr(config, "distill_alpha", 0.25))
    step_fn = make_distill_step(
        student,
        temperature=float(getattr(config, "distill_temperature", 2.0)),
        kd_weight=alpha, ce_weight=1.0 - alpha,
        fast_rng=bool(getattr(config, "fast_rng", True)),
    )
    if fsdp:
        # pin the carried state's FSDP shardings on the step output — free
        # GSPMD propagation drifts sharded params back to replicated after
        # the first update (measured; parallel/fsdp.py)
        from spectre_tpu.parallel import pin_step_shardings

        step_fn = pin_step_shardings(step_fn, state)
    eval_step = make_eval_step(student)

    img_size = int(config.img_size)
    if train_x.shape[-1] != img_size:
        resize = jax.jit(lambda v: resize_bilinear(v, img_size))
    else:
        resize = lambda v: v  # noqa: E731

    if cache_teacher is None:
        cache_teacher = bool(getattr(config, "distill_cache_teacher", True))
        if cache_teacher and max_steps is not None \
                and max_steps <= steps_per_epoch:
            # a run that never revisits a sample (smoke runs, CI) gains
            # nothing from the cache but pays a full teacher pass up front —
            # recompute per step instead (identical numerics either way, see
            # the parity test; the cache only changes WHEN teacher logits
            # are computed). An explicit cache_teacher=True kwarg overrides.
            cache_teacher = False
    logit_cache = None
    if cache_teacher:
        t_cache0 = time.time()
        from spectre_tpu.parallel import batch_sharding

        logit_cache = precompute_teacher_logits(
            teacher_logits_fn, train_x, local_batch, int(config.num_classes),
            # stage chunks mesh-sharded exactly like prefetch_to_mesh stages
            # the hot loop's batches — same teacher executable, bitwise-equal
            # logits (single-process; multi-host caches are per-process and
            # the recompute path there also sees process-local staging)
            place=(None if pcount > 1
                   else (lambda c: jax.device_put(c, batch_sharding(mesh)))))
        if is_main:
            print(f"teacher-logit cache: {logit_cache.shape[0]} x "
                  f"{logit_cache.shape[1]} f32 "
                  f"({logit_cache.nbytes / 1e6:.1f} MB) in "
                  f"{time.time() - t_cache0:.1f}s — teacher leaves the hot "
                  "loop")

    def batches_with_teacher(it):
        """Join the cached logits against each shuffled batch by index."""
        for b in it:
            b = dict(b)
            b["teacher_logits"] = logit_cache[b["index"]]
            yield b

    name = "distill_" + experiment_name(config)
    logdir = f"{getattr(config, 'checkpoint_dir', 'runs')}/{name}"
    writer = MetricsWriter(logdir) if (write_metrics and is_main) else None
    ckpt = CheckpointManager(
        f"{logdir}/ckpt", max_to_keep=getattr(config, "keep_checkpoints", 3),
        best_metric="accuracy") if checkpoint else None
    if resume and ckpt and ckpt.latest_step is not None:
        state = ckpt.restore(state)
        if is_main:
            print(f"resumed from step {int(state.step)}")

    if getattr(config, "mix_routed", False):
        # Clos-routed mix backward for the student (mirrors train/loop.py)
        from spectre_tpu.ops.fused_mix import register_mix_routes

        keys = register_mix_routes(
            state.variables(),
            impl=getattr(config, "mix_routed_impl", "mxu"))
        if is_main and keys:
            print(f"mix routes registered: {len(keys)}")
    elif getattr(config, "mix_block", 0):
        # block-structured student permutations — see train/loop.py
        # (mesh-aware: shard_maps the block kernel on multi-device meshes)
        from spectre_tpu.ops.fused_mix import register_block_mix_routes

        keys = register_block_mix_routes(state.variables(), mesh=mesh)
        if is_main and keys:
            print(f"block mix routes registered: {len(keys)}")
    else:
        # mirror train/loop.py: drop any routes a previous model registered
        # under the same scope paths in this process
        from spectre_tpu.ops.fused_mix import clear_mix_routes

        clear_mix_routes()

    # preemption-aware save (mirrors train/loop.py:204-213): on SIGTERM/SIGINT
    # finish the current step, checkpoint the full state, then stop
    preempted = {"flag": False}

    def _on_signal(signum, frame):
        preempted["flag"] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:  # not the main thread (tests)
            pass

    # per-step aug keys are fold_in(base, step) — the train/step.py pattern:
    # O(1) to derive at any step, so resume needs no key fast-forward chain
    aug_base_key = jax.random.key(getattr(config, "random_seed", 42) + 2)
    # resume continues the epoch count from the restored step (running the
    # full config.epochs AGAIN would overtrain past the cosine schedule);
    # a MID-epoch restore (the preemption case) also skips the
    # already-trained prefix of the interrupted epoch below, so the run
    # still ends at exactly epochs*steps_per_epoch and never outruns the
    # cosine schedule
    start_epoch = int(state.step) // steps_per_epoch
    skip_batches = int(state.step) % steps_per_epoch
    total_steps = int(state.step)
    t0 = time.time()
    done = False
    metrics = None
    last_val = -1.0
    log_every = int(getattr(config, "log_every", 50))
    val_local_batch = max(1, int(getattr(config, "val_batch_size",
                                         batch_size)) // pcount)
    # resume determinism: fast-forward the epoch shuffles past the completed
    # epochs so the data order continues exactly (aug keys need no chain —
    # they are a pure function of the step number)
    for _ in range(start_epoch):
        train_iter.skip_epoch()

    for epoch in range(start_epoch, int(config.epochs)):
        if done:
            break
        pending = []  # device metrics, fetched in one batched D2H per window
        src = iter(batches_with_teacher(train_iter) if cache_teacher
                   else train_iter)
        if skip_batches:
            # replay-skip the interrupted epoch's trained prefix (same
            # shuffle stream, no training) so mid-epoch resume neither
            # retrains those batches nor overruns the schedule
            src = itertools.islice(src, skip_batches, None)
            skip_batches = 0
        it = prefetch_to_mesh(src, mesh)
        for batch in it:
            raw = batch["image"]
            k = jax.random.fold_in(aug_base_key, total_steps)
            img_student = augment(k, resize(raw))
            if cache_teacher:
                teacher_logits = batch["teacher_logits"]
            else:
                teacher_logits = teacher_logits_fn(raw)
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
            if preempted["flag"] or (max_steps is not None
                                     and total_steps >= max_steps):
                done = True
                break
        if writer and pending:
            for step_no, m in jax.device_get(pending):
                writer.scalar("Batch Loss/Train", m["loss"], step_no)
                writer.scalar("Batch Loss/Dist", m["loss_dist"], step_no)
                writer.scalar("Batch Loss/CE", m["loss_ce"], step_no)
            pending = []

        if preempted["flag"]:
            # skip the epoch tail (full val pass): the SIGTERM grace window
            # must go to the preemption checkpoint save below, not an eval
            # sweep that can be SIGKILLed before any save happens
            break

        # per-epoch student validation: sums accumulate ON DEVICE, one D2H
        # (reuses the train loop's eval machinery, train/loop.py:260-274)
        dev_sums = None
        for vbatch in prefetch_to_mesh(
                BatchIterator(val_x, val_y, val_local_batch, shuffle=False),
                mesh):
            images = eval_transform(vbatch["image"])
            out = eval_step(state.params, state.buffers, images,
                            vbatch["label"], vbatch["mask"])
            if pcount > 1:
                # eval_step launches are mutually INDEPENDENT (each reads
                # only params + its batch), so the async runtime may overlap
                # several in-flight executions — and each contains a
                # cross-process collective (the global accuracy/loss
                # reduce). Overlapped launches of the same program can pair
                # process A's eval#i with process B's eval#j at the
                # collective rendezvous and deadlock (observed: both
                # processes hung dispatching the NEXT op with CPU time
                # frozen, tests/test_multihost.py distill smoke). Serialize
                # execution across processes; one sync per val batch, once
                # per epoch. Single-process runs keep the async pipeline
                # (per-device programs execute in order there).
                out = jax.block_until_ready(out)
            dev_sums = out if dev_sums is None else jax.tree.map(
                jnp.add, dev_sums, out)
        if dev_sums is not None:
            sums = jax.device_get(dev_sums)
            val_acc = float(sums["correct"]) / max(float(sums["count"]), 1)
            val_loss = float(sums["loss_sum"]) / max(float(sums["count"]), 1)
        else:
            val_acc, val_loss = 0.0, float("nan")
        last_val = val_acc
        if writer:
            writer.scalar("Loss/Validation", val_loss, total_steps)
            writer.scalar("Accuracy/Validation", val_acc, total_steps)
            writer.flush()
        if is_main and metrics is not None:
            print(f"distill epoch {epoch + 1}/{int(config.epochs)} "
                  f"step {total_steps} val loss {val_loss:.4f} "
                  f"acc {val_acc:.4f}")
        if ckpt and metrics is not None:
            ckpt.save(state, {"accuracy": val_acc,
                              "neg_loss": -float(jax.device_get(metrics)["loss"])})
    if metrics is None:
        raise RuntimeError("no training batches ran (empty dataset, epochs=0, "
                           "or resume past the final epoch) — nothing to "
                           "return")
    if ckpt:
        if preempted["flag"]:
            ckpt.save(state, {"accuracy": last_val})
            if is_main:
                print(f"preempted at step {total_steps}: state checkpointed, "
                      "resume with --resume")
        ckpt.wait()
        ckpt.close()
    if writer:
        writer.scalar("Training time", time.time() - t0, total_steps)
        writer.close()
    for sig, handler in prev_handlers.items():
        signal.signal(sig, handler)
    return state, jax.device_get(metrics)
