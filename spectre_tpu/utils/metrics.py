"""Metrics / observability writer.

Same metric surface as the reference (SURVEY.md §5.5): TensorBoard scalars
``Loss/{Train,Validation}``, ``Accuracy/{Train,Validation}`` per epoch
(train.py:274-286), per-batch ``Batch Loss/{Train,Dist,CE}`` in distillation
(train.py:355-359), a terminal ``Training time`` scalar (train.py:292-295),
and the systematic experiment naming that encodes hyperparameters
(train.py:28,42) — plus the TPU north-star metrics the reference lacked:
``Perf/steps_per_sec`` and ``Perf/images_per_sec_per_chip``.

Backend: tensorboardX when importable, always mirrored to a JSONL event log so
headless/CI runs stay observable without TensorBoard.
"""

from __future__ import annotations

import json
import os
import time
from types import SimpleNamespace

try:
    from tensorboardX import SummaryWriter  # type: ignore
except Exception:  # pragma: no cover - env without tensorboardX
    SummaryWriter = None


def experiment_name(config: SimpleNamespace) -> str:
    """Hyperparameter-encoding run name (reference naming scheme, train.py:28)."""
    parts = [
        getattr(config, "model", "model"),
        getattr(config, "dataset", "data"),
        f"m{getattr(config, 'method', 'none')}",
        f"e{config.embed_dim}",
        f"l{config.num_encoders}",
        f"h{config.num_heads}",
        f"p{config.patch_size}",
        f"b{config.batch_size}",
        f"lr{getattr(config, 'learning_rate', 1e-3):g}",
    ]
    return "_".join(str(p) for p in parts)


class MetricsWriter:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._tb = (
            SummaryWriter(logdir)
            if (use_tensorboard and SummaryWriter is not None)
            else None
        )
        self._jsonl = open(os.path.join(logdir, "events.jsonl"), "a")
        self._t0 = time.time()

    def scalar(self, tag: str, value, step: int):
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(
            json.dumps({"t": round(time.time() - self._t0, 3), "step": int(step),
                        "tag": tag, "value": value}) + "\n"
        )

    def scalars(self, prefix: str, metrics: dict, step: int):
        for k, v in metrics.items():
            self.scalar(f"{prefix}/{k}", v, step)

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self):
        self.flush()
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
