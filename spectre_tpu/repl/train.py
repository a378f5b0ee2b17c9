"""Config-driven training entry point.

The reference's primary driver is a Jupyter-cell script with a hard-coded
config path (train.py:26-27) and no CLI. Here it is a real script:

    python -m spectre_tpu.repl.train --config spectre_tpu/configs/spectre_vit_cifar100.py
    python -m spectre_tpu.repl.train --config ... --steps 5 --synthetic   # smoke
    python -m spectre_tpu.repl.train --config ... --resume                # exact resume
    python -m spectre_tpu.repl.train --config ... --set epochs=1 batch_size=64

Distillation (``use_distillation = True`` in config, reference train.py:298-396)
is driven by spectre_tpu.repl.distill.
"""

from __future__ import annotations

import argparse
import ast

from spectre_tpu.configs import parse_config
from spectre_tpu.train.loop import train_from_config


def apply_overrides(config, pairs: list[str]):
    for pair in pairs:
        key, _, raw = pair.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        setattr(config, key.strip(), value)
    return config


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="path to a python config module")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-host SPMD over "
                        "DCN; reads the standard coordinator env vars)")
    p.add_argument("--steps", type=int, default=None, help="cap total train steps (smoke mode)")
    p.add_argument("--synthetic", action="store_true", help="force hermetic synthetic data")
    p.add_argument("--resume", action="store_true", help="resume from the latest checkpoint")
    p.add_argument("--no-checkpoint", action="store_true")
    p.add_argument("--set", nargs="*", default=[], help="config overrides key=value")
    args = p.parse_args(argv)

    from spectre_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.multihost:
        import jax

        # the data mesh then spans all processes; XLA routes the gradient
        # psum over ICI within a slice and DCN across hosts (SURVEY.md §5.8)
        jax.distributed.initialize()

    config = apply_overrides(parse_config(args.config), args.set)
    if getattr(config, "use_distillation", False):
        # distillation phase (reference train.py:298-396) — delegate
        from spectre_tpu.distill.loop import distill_from_config

        state, metrics = distill_from_config(
            config, max_steps=args.steps, synthetic=args.synthetic,
            teacher_img_size=int(getattr(config, "teacher_img_size", 224)))
        print(f"distill done: step {int(state.step)} loss {metrics['loss']:.4f}")
        return state, metrics
    result = train_from_config(
        config,
        max_steps=args.steps,
        synthetic=args.synthetic,
        resume=args.resume,
        checkpoint=not args.no_checkpoint,
    )
    print(
        f"done: best val acc {result.best_val_accuracy:.4f} "
        f"({result.steps_per_sec:.2f} steps/s, "
        f"{result.images_per_sec_per_chip:.1f} img/s/chip) -> {result.logdir}"
    )
    return result


if __name__ == "__main__":
    main()
