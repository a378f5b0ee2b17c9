"""Optimizer / schedule factory.

Feature parity with the reference training recipe (train.py:199-205):
AdamW(lr, weight_decay, betas) + cosine annealing over the total step count,
plus the linear warmup the reference imported but left commented out
(train.py:11,204,240-241) — here it is a config knob (``warmup_epochs``,
default 0 = reference behavior).
"""

from __future__ import annotations

from types import SimpleNamespace

import optax


def make_schedule(config: SimpleNamespace, steps_per_epoch: int) -> optax.Schedule:
    lr = getattr(config, "learning_rate", 1e-3)
    total_steps = max(1, int(config.epochs) * int(steps_per_epoch))
    warmup_steps = int(getattr(config, "warmup_steps", 0) or
                       getattr(config, "warmup_epochs", 0) * steps_per_epoch)
    eta_min = getattr(config, "eta_min", 0.0)
    if warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=warmup_steps,
            decay_steps=total_steps,
            end_value=eta_min,
        )
    return optax.cosine_decay_schedule(lr, decay_steps=total_steps, alpha=eta_min / lr if lr else 0.0)


def make_optimizer(config: SimpleNamespace, steps_per_epoch: int) -> optax.GradientTransformation:
    """AdamW + cosine schedule (reference train.py:199-203), with optional
    gradient clipping (``grad_clip_norm``) — the TPU stand-in for the fp16
    GradScaler the reference needed (bf16 training needs no loss scaling)."""
    schedule = make_schedule(config, steps_per_epoch)
    tx = optax.adamw(
        learning_rate=schedule,
        b1=getattr(config, "adam_betas", (0.9, 0.999))[0],
        b2=getattr(config, "adam_betas", (0.9, 0.999))[1],
        weight_decay=getattr(config, "adam_weight_decay", 1e-4),
    )
    clip = getattr(config, "grad_clip_norm", None) or 0.0
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx
