"""Checkpoint evaluation entry point: restore a trained state and report
val loss / top-1 accuracy (the reference only evaluated in-loop,
train.py:254-273; this makes eval a standalone workflow step).

    python -m spectre_tpu.repl.eval --config spectre_tpu/configs/spectre_vit_cifar100.py \
        --checkpoint runs/<experiment>/ckpt [--best] [--synthetic]
"""

from __future__ import annotations

import argparse

import jax

from spectre_tpu.configs import parse_config
from spectre_tpu.data import BatchIterator, make_eval_transform
from spectre_tpu.models import build_model, example_input
from spectre_tpu.repl.train import apply_overrides
from spectre_tpu.train.checkpoint import CheckpointManager
from spectre_tpu.train.loop import _dataset_stats
from spectre_tpu.train.optim import make_optimizer
from spectre_tpu.train.state import create_train_state
from spectre_tpu.train.step import make_eval_step


def evaluate(config, checkpoint: str | None = None, best: bool = False,
             synthetic: bool = False):
    from spectre_tpu.train.loop import load_sized_dataset

    dataset = getattr(config, "dataset", "mnist")
    val_x, val_y = load_sized_dataset(config, "test", synthetic)

    model = build_model(config)
    tx = make_optimizer(config, steps_per_epoch=1)
    state = create_train_state(model, tx, example_input(config, batch_size=2),
                               seed=getattr(config, "random_seed", 42))
    if checkpoint:
        mgr = CheckpointManager(checkpoint)
        step = mgr.best_step if best else None
        state = mgr.restore(state, step=step)
        print(f"restored step {int(state.step)} from {checkpoint}"
              f"{' (best)' if best else ' (latest)'}")

    mean, std = _dataset_stats(dataset)
    transform = make_eval_transform(mean, std)
    eval_step = make_eval_step(model)

    sums = {"loss_sum": 0.0, "correct": 0.0, "count": 0.0}
    for batch in BatchIterator(val_x, val_y,
                               int(getattr(config, "val_batch_size", 256)),
                               shuffle=False):
        out = jax.device_get(eval_step(
            state.params, state.buffers, transform(batch["image"]),
            batch["label"], batch["mask"]))
        for k in sums:
            sums[k] += float(out[k])
    loss = sums["loss_sum"] / max(sums["count"], 1)
    acc = sums["correct"] / max(sums["count"], 1)
    print(f"val: loss {loss:.4f} top-1 {acc:.4f} ({int(sums['count'])} examples)")
    return loss, acc


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--best", action="store_true",
                   help="restore the best-val-accuracy step instead of latest")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--set", nargs="*", default=[])
    args = p.parse_args(argv)

    from spectre_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = apply_overrides(parse_config(args.config), args.set)
    return evaluate(config, args.checkpoint, args.best, args.synthetic)


if __name__ == "__main__":
    main()
