"""Orbax checkpointing: full train state, best-metric + latest, resume.

The reference saves weights only, keyed on best val accuracy, with no resume
path (train.py:288-290; SURVEY.md §5.3/§5.4 list this as the failure-recovery
gap). Here every save captures params + buffers (the fixed permutation/sign
tables — SURVEY.md §7 requires them to round-trip) + optimizer state + step +
PRNG key, so a preempted run resumes exactly; the manager keeps the latest N
plus the best-val-accuracy step.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from spectre_tpu.train.state import TrainState


def _to_saveable(state: TrainState) -> dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "buffers": state.buffers,
        "opt_state": state.opt_state,
        # typed PRNG keys are not serializable as-is; store raw key data
        "rng_data": jax.random.key_data(state.rng),
    }


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, best_metric: str = "accuracy"):
        self.directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda metrics: float(metrics.get(best_metric, -np.inf)),
                best_mode="max",
                create=True,
            ),
        )

    def save(self, state: TrainState, metrics: dict[str, float] | None = None):
        self._mgr.save(
            int(state.step),
            args=ocp.args.StandardSave(_to_saveable(state)),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def wait(self):
        self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    @property
    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def restore(self, state: TrainState, step: int | None = None) -> TrainState:
        """Restore into the structure of ``state`` (must be built from the same
        model/optimizer). ``step=None`` -> latest."""
        step = self.latest_step if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        template = _to_saveable(state)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            buffers=restored["buffers"],
            opt_state=restored["opt_state"],
            rng=jax.random.wrap_key_data(restored["rng_data"]),
        )

    def close(self):
        self._mgr.close()
