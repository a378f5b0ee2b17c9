"""Train state: the full resumable training snapshot.

The reference checkpoints weights only (train.py:288-290 — no optimizer state,
no step counter, no resume; SURVEY.md §5.4 flags this as the gap to fix). Here
the state carries params, non-trainable buffers (the MHPermutMix permutation /
sign tables — fixed random state that must round-trip through checkpoints,
SURVEY.md §7), optimizer state, the step counter and the dropout PRNG key, so
training resumes exactly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    buffers: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.buffers:
            v["buffers"] = self.buffers
        return v

    def apply_gradients(self, grads, new_rng):
        # named scope makes the optimizer's HLO carry "adamw_update" in its
        # op_name metadata so the step-accounting harness can attribute the
        # update math (optax emits bare mul/add scopes otherwise, which land
        # in whatever fusion XLA folds them into, unattributed)
        with jax.named_scope("adamw_update"):
            updates, new_opt_state = self.tx.update(
                grads, self.opt_state, self.params)
            new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            rng=new_rng,
        )


def create_train_state(
    model, tx: optax.GradientTransformation, example_input: jnp.ndarray, seed: int = 42
) -> TrainState:
    """Initialize model + optimizer state from a PRNG seed (the reference
    seeds all RNGs at train.py:31-35; a single JAX key subsumes that)."""
    root = jax.random.key(seed)
    init_key, dropout_key = jax.random.split(root)
    variables = model.init(init_key, example_input)
    params = variables["params"]
    buffers = variables.get("buffers", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        buffers=buffers,
        opt_state=tx.init(params),
        rng=dropout_key,
        tx=tx,
    )


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
