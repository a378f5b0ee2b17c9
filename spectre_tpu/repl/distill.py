"""Distillation entry point (reference train.py:298-396 second phase).

    python -m spectre_tpu.repl.distill --config spectre_tpu/configs/distill_cifar100.py
    python -m spectre_tpu.repl.distill --config ... --steps 3 --synthetic   # smoke

Real DINOv3 weights load from $SPECTRE_TEACHER_WEIGHTS (npz dump of the torch
state_dict — see distill/teacher.py); otherwise a seeded random teacher is
used so the machinery runs hermetically.
"""

from __future__ import annotations

import argparse

from spectre_tpu.configs import parse_config
from spectre_tpu.distill.loop import distill_from_config
from spectre_tpu.repl.train import apply_overrides


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--teacher-size", type=int, default=224)
    p.add_argument("--no-checkpoint", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest distill checkpoint")
    p.add_argument("--no-teacher-cache", action="store_true",
                   help="recompute the frozen teacher every step instead of "
                        "caching its logits once per run")
    p.add_argument("--set", nargs="*", default=[])
    args = p.parse_args(argv)

    from spectre_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    config = apply_overrides(parse_config(args.config), args.set)
    state, metrics = distill_from_config(
        config, max_steps=args.steps, synthetic=args.synthetic,
        teacher_img_size=args.teacher_size,
        checkpoint=not args.no_checkpoint, resume=args.resume,
        cache_teacher=False if args.no_teacher_cache else None)
    print(f"distill done: step {int(state.step)} loss {metrics['loss']:.4f} "
          f"(kd {metrics['loss_dist']:.4f} / ce {metrics['loss_ce']:.4f})")
    return state, metrics


if __name__ == "__main__":
    main()
