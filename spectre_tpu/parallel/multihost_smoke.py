"""Multi-process (multi-host) smoke worker.

Exercises the ``--multihost`` path (repl/train.py:52-57) that single-host
runs never hit: ``jax.distributed.initialize`` with an explicit coordinator,
a global mesh spanning both processes, one data-parallel train step built
from per-process local shards (``jax.make_array_from_process_local_data``),
and an orbax save + restore through train/checkpoint.py in the multi-process
setting. Run by tests/test_multihost.py as 2 subprocesses on the CPU
platform (each contributing 2 virtual devices -> a 4-device global mesh);
the same entry works across real hosts with a reachable coordinator.

    python -m spectre_tpu.parallel.multihost_smoke \
        --coordinator localhost:12355 --num-processes 2 --process-id 0 \
        --ckpt-dir /tmp/ckpt
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--ckpt-dir", default="")
    p.add_argument("--local-devices", type=int, default=2)
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                   help="cpu (default; virtual devices for the CI harness) "
                        "or tpu for a REAL multi-host validation run")
    p.add_argument("--train-loop", action="store_true",
                   help="run train_from_config (full loop: sliced data, "
                        "prefetch, eval, metrics) instead of the bare step")
    p.add_argument("--distill-loop", action="store_true",
                   help="run distill_from_config (teacher-logit cache over "
                        "per-process slices, dual views, KD+CE step, eval)")
    p.add_argument("--fsdp", action="store_true",
                   help="run the bare step with ZeRO-3 state: params + AdamW "
                        "moments sharded over the cross-process data axis "
                        "(parallel/fsdp.py), shardings pinned, orbax "
                        "save/restore of the sharded layout")
    args = p.parse_args(argv)

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={args.local_devices}"
            ).strip()

    import jax

    if args.platform == "cpu":
        # this image's sitecustomize registers the TPU plugin at interpreter
        # start; the env var alone is too late — force through jax.config
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectre_tpu.models import SpectreViT
    from spectre_tpu.parallel import create_mesh
    from spectre_tpu.train import create_train_state, make_optimizer, make_train_step
    from types import SimpleNamespace

    assert jax.process_count() == args.num_processes
    n_global = jax.device_count()
    if args.platform == "cpu":
        assert n_global == args.num_processes * args.local_devices

    if args.train_loop:
        # the REAL training loop end-to-end across processes: per-process
        # data slices, prefetch_to_mesh -> make_array_from_process_local_data,
        # masked eval, process-0-only metrics
        from spectre_tpu.train.loop import train_from_config

        cfg = SimpleNamespace(
            model="spectre_vit", method="permut_mix", dataset="mnist",
            img_size=8, patch_size=4, in_channels=1, num_classes=10,
            embed_dim=16, num_encoders=1, num_heads=2, hidden_dim=24,
            dropout=0.0, batch_size=4 * n_global, val_batch_size=4 * n_global,
            epochs=1, learning_rate=1e-3, random_seed=0,
            compute_dtype="float32",
            checkpoint_dir=args.ckpt_dir or "runs",
        )
        result = train_from_config(cfg, synthetic=True, max_steps=2,
                                   checkpoint=False)
        print(json.dumps({
            "process_id": args.process_id,
            "process_count": jax.process_count(),
            "global_devices": n_global,
            "loss": -1.0,
            "step": int(jax.device_get(result.state.step)),
            "val_accuracy": result.last_val_accuracy,
            "restore_exact": None,
        }), flush=True)
        return

    if args.distill_loop:
        # the REAL distillation loop across processes: per-process teacher
        # logit cache (each process precomputes its own slice), dual views,
        # fused KD+CE step, per-epoch masked student eval
        from spectre_tpu.distill.loop import distill_from_config
        from spectre_tpu.distill.teacher import (DinoClassifier,
                                                 DinoVisionTransformer)

        cfg = SimpleNamespace(
            model="spectre_vit", method="permut_mix", dataset="mnist",
            img_size=8, patch_size=4, in_channels=1, num_classes=10,
            embed_dim=16, num_encoders=1, num_heads=2, hidden_dim=24,
            dropout=0.0, batch_size=4 * n_global, val_batch_size=4 * n_global,
            epochs=1, learning_rate=1e-3, random_seed=0,
            compute_dtype="float32",
            checkpoint_dir=args.ckpt_dir or "runs",
        )
        teacher = DinoClassifier(
            backbone=DinoVisionTransformer(img_size=16, patch_size=16,
                                           embed_dim=32, depth=2, num_heads=2,
                                           num_registers=2, variant="v3"),
            num_classes=10)
        tvars = teacher.init(jax.random.key(1), jnp.zeros((1, 3, 16, 16)))
        state, metrics = distill_from_config(
            cfg, synthetic=True, max_steps=2, teacher=teacher,
            teacher_variables=tvars, write_metrics=False, checkpoint=False,
            cache_teacher=True)  # explicit: exercise the per-process cache
        print(json.dumps({
            "process_id": args.process_id,
            "process_count": jax.process_count(),
            "global_devices": n_global,
            "loss": float(metrics["loss"]),
            "step": int(jax.device_get(state.step)),
            "restore_exact": None,
        }), flush=True)
        return

    model = SpectreViT(img_size=8, patch_size=4, in_channels=3, num_classes=5,
                       embed_dim=16, num_encoders=1, num_heads=2,
                       hidden_dim=24, dropout=0.0)
    cfg = SimpleNamespace(learning_rate=1e-3, epochs=1)
    mesh = create_mesh()

    global_batch = 2 * n_global
    local_batch = global_batch // args.num_processes
    rng = np.random.default_rng(0)  # same data everywhere; shards differ by slice
    x_all = rng.uniform(0, 1, (global_batch, 3, 8, 8)).astype(np.float32)
    y_all = rng.integers(0, 5, global_batch).astype(np.int32)
    lo = args.process_id * local_batch
    x_local, y_local = x_all[lo:lo + local_batch], y_all[lo:lo + local_batch]

    data_sharding = NamedSharding(mesh, P(("data",)))
    x = jax.make_array_from_process_local_data(data_sharding, x_local)
    y = jax.make_array_from_process_local_data(data_sharding, y_local)

    state = create_train_state(model, make_optimizer(cfg, 1),
                               jnp.zeros((global_batch, 3, 8, 8)), seed=0)
    step = make_train_step(model)
    fsdp_sharded = None
    if args.fsdp:
        # ZeRO-3 across processes: the data axis spans both hosts, so each
        # process holds only ITS shards of params + AdamW moments; the same
        # train step runs with the carried shardings pinned
        from spectre_tpu.parallel import apply_fsdp, pin_step_shardings

        state = apply_fsdp(state, mesh, min_size=256)
        step = pin_step_shardings(step, state)
        n_data = mesh.devices.shape[0]
        big = [p for p in jax.tree.leaves(state.params) if p.size >= 256]
        assert big, "no param leaf large enough to shard"
        fsdp_sharded = all(
            "data" in str(p.sharding.spec)
            # each process addresses exactly its slice: local shard bytes =
            # global/size_of_data_axis x local devices
            and sum(s.data.size for s in p.addressable_shards)
                == p.size // n_data * len(p.sharding.addressable_devices)
            for p in big)
    state, metrics = step(state, x, y)
    loss = float(jax.device_get(metrics["loss"]))

    restored_ok = None
    if args.ckpt_dir:
        from spectre_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(args.ckpt_dir, max_to_keep=1)
        ckpt.save(state, {"accuracy": 0.0})
        ckpt.wait()
        restored = ckpt.restore(state)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            jax.tree.leaves(state.params), jax.tree.leaves(restored.params))
        restored_ok = max(jax.tree.leaves(diffs) or [0.0]) == 0.0
        ckpt.close()

    print(json.dumps({
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": n_global,
        "loss": loss,
        "step": int(jax.device_get(state.step)),
        "restore_exact": restored_ok,
        "fsdp_sharded": fsdp_sharded,
    }), flush=True)


if __name__ == "__main__":
    main()
