"""Debugging / determinism toggles (SURVEY.md §5.2).

The reference's only knobs were RNG seeding (train.py:31-35) and
cudnn.deterministic in the MNIST script. JAX is functional, so determinism is
the default given a pinned key; these helpers cover the remaining switches:

- ``enable_nan_checks``  — jax_debug_nans: every jitted computation re-runs
  eagerly on NaN and points at the producing primitive (the analogue of
  torch.autograd.detect_anomaly).
- ``deterministic_mode`` — pins matmul precision to highest (no TF32-style
  fast paths). On TPU, jitted programs are already run-to-run deterministic
  given fixed inputs/keys; there is no GPU-style atomics nondeterminism to
  disable.
- ``check_finite``       — in-jit NaN/Inf detector. It CANNOT raise from
  inside a traced computation; it prints the offending leaf path and
  returns a boolean scalar ("all finite") the caller can assert on after a
  host sync. For hard failure at the producing op, use
  ``enable_nan_checks`` (jax_debug_nans).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def deterministic_mode(on: bool = True) -> None:
    # matmul precision is the only live knob on TPU: reductions in jitted
    # programs are already deterministic for fixed inputs. (A round-4 review
    # removed a --xla_gpu_deterministic_ops env mutation here: the flag is
    # GPU-only and XLA_FLAGS is read at backend init, so setting it after
    # import was a silent no-op.)
    jax.config.update("jax_default_matmul_precision", "highest" if on else None)


def check_finite(tree, name: str = "tree"):
    """Inside-jit finite check.

    Prints the offending leaf path when NaN/Inf appears and returns a
    boolean scalar (True = all finite) so callers can enforce on the host:

        ok = check_finite(grads, "grads")      # inside the jitted step
        ...
        assert bool(ok_host)                    # after device_get

    A traced computation cannot raise; for a hard stop at the producing
    primitive use ``enable_nan_checks`` instead.
    """
    all_ok = jnp.bool_(True)
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        label = f"{name}{jax.tree_util.keystr(path)}"
        ok = jnp.all(jnp.isfinite(leaf))
        jax.lax.cond(
            jnp.logical_not(ok),
            lambda: jax.debug.print("NON-FINITE values in " + label),
            lambda: None,
        )
        all_ok = jnp.logical_and(all_ok, ok)
    return all_ok
