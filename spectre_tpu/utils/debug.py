"""Debugging / determinism toggles (SURVEY.md §5.2).

The reference's only knobs were RNG seeding (train.py:31-35) and
cudnn.deterministic in the MNIST script. JAX is functional, so determinism is
the default given a pinned key; these helpers cover the remaining switches:

- ``enable_nan_checks``  — jax_debug_nans: every jitted computation re-runs
  eagerly on NaN and points at the producing primitive (the analogue of
  torch.autograd.detect_anomaly).
- ``deterministic_mode`` — pins matmul precision to highest (no TF32-style
  fast paths) and disables nondeterministic reduction orders via the XLA
  deterministic-ops flag.
- ``check_finite``       — assert a pytree is NaN/Inf-free inside jit
  (uses jax.debug so it works under tracing).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def deterministic_mode(on: bool = True) -> None:
    jax.config.update("jax_default_matmul_precision", "highest" if on else None)
    flags = os.environ.get("XLA_FLAGS", "")
    flag = "--xla_gpu_deterministic_ops=true"
    if on and flag not in flags:
        os.environ["XLA_FLAGS"] = f"{flags} {flag}".strip()


def check_finite(tree, name: str = "tree") -> None:
    """Inside-jit finite check: prints the offending leaf path on failure."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        label = f"{name}{jax.tree_util.keystr(path)}"
        bad = jnp.logical_not(jnp.all(jnp.isfinite(leaf)))
        jax.lax.cond(
            bad,
            lambda: jax.debug.print("NON-FINITE values in " + label),
            lambda: None,
        )
