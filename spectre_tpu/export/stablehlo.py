"""StableHLO model export.

Capability parity with the reference ONNX exporter (repl/export.py:39-82:
torch.onnx dynamo export + onnxsim + validation assert). TPU-native path:
``jax.export`` serializes the jitted forward (with weights folded in as
constants) to portable StableHLO bytes; ``verify_export`` replays the
deserialized artifact against the live model — the analogue of the
reference's onnxsim check assert (export.py:81), but an exact numerical
parity check instead of a structural one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport


def export_forward(model, variables, example_input: jnp.ndarray):
    """Export ``model.apply(variables, x)`` with weights baked in.

    Returns a jax.export.Exported object; its ``serialize()`` bytes are the
    artifact (StableHLO + calling convention).
    """

    def forward(x):
        return model.apply(variables, x)

    spec = jax.ShapeDtypeStruct(example_input.shape, example_input.dtype)
    return jexport.export(jax.jit(forward))(spec)


def save_exported(exported, path: str) -> str:
    with open(path, "wb") as f:
        f.write(bytes(exported.serialize()))
    return path


def load_exported(path: str):
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


def verify_export(exported_or_path, model, variables, example_input,
                  atol: float = 1e-5) -> float:
    """Replay the exported artifact and compare against the live model.

    Returns the max abs deviation (raises on mismatch > atol)."""
    exported = (
        load_exported(exported_or_path)
        if isinstance(exported_or_path, str)
        else exported_or_path
    )
    got = np.asarray(exported.call(example_input))
    want = np.asarray(model.apply(variables, example_input))
    err = float(np.max(np.abs(got - want)))
    if err > atol:
        raise AssertionError(f"export parity check failed: max|delta|={err} > {atol}")
    return err
