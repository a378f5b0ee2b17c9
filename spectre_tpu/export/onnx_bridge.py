"""Best-effort ONNX bridge (reference repl/export.py:64-81).

Committed artifact surface (PARITY.md): **StableHLO + ``.stw``**. The
StableHLO export is parity-verified by exact numerical replay and the
``.stw`` weights feed the first-party C++ inference/serving runtime —
together they cover every consumer the reference served with ONNX, with a
stronger validation story (the reference asserted onnxsim's structural
check only).

For deployment consumers that specifically require ``.onnx``, this module
converts via jax2tf -> tf2onnx WHEN those packages are installed (they are
not baked into this image — tensorflow is, tf2onnx/onnx are not), and
replays the artifact through onnxruntime against the live model when that
is importable too. Raising a clear RuntimeError with the stance otherwise
is deliberate: a silently skipped export is how stale artifacts ship.

Known toolchain limit (verified on this image's JAX): ``jax2tf.convert``
now always emits a single ``XlaCallModule`` op wrapping StableHLO — the
old plain-TF graph serialization is gone even with
``native_serialization=False`` — so the bridge only succeeds once tf2onnx
grows an XlaCallModule/StableHLO handler. The conversion is still
attempted (a capable tf2onnx makes it work unchanged) and any failure
raises the documented stance instead of shipping nothing silently.
"""

from __future__ import annotations

import numpy as np


def export_onnx(model, variables, x, path: str, atol: float = 1e-4) -> float | None:
    """Write ``path`` (.onnx) for ``model.apply(variables, .)``.

    Returns the replay max-abs-error when onnxruntime is available, else
    None (conversion done, replay not possible). Raises RuntimeError with
    the documented artifact stance when the toolchain is absent.
    """
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
        import tf2onnx
    except ImportError as e:
        raise RuntimeError(
            "ONNX export needs tensorflow + tf2onnx (+ onnx); they are not "
            "installed in this environment. The committed artifact surface "
            "is StableHLO (model.stablehlo, numerically replay-verified) + "
            ".stw weights for the native C++ runtime — see PARITY.md. "
            "Install tf2onnx/onnx to enable this bridge."
        ) from e

    def fn(xx):
        return model.apply(variables, xx)

    spec = [tf.TensorSpec(list(x.shape), tf.float32, name="input")]
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False), autograph=False,
        input_signature=spec)
    try:
        tf2onnx.convert.from_function(tf_fn, input_signature=spec, opset=17,
                                      output_path=path)
    except Exception as e:
        raise RuntimeError(
            "jax2tf -> tf2onnx conversion failed — modern jax2tf emits an "
            "XlaCallModule-wrapped StableHLO graph (the plain-TF graph "
            "serialization was removed from JAX), which this tf2onnx cannot "
            "convert. The committed artifact surface is StableHLO "
            "(model.stablehlo, numerically replay-verified) + .stw weights "
            "for the native C++ runtime — see PARITY.md."
        ) from e

    try:
        import onnxruntime as ort
    except ImportError:
        return None
    sess = ort.InferenceSession(path, providers=["CPUExecutionProvider"])
    got = sess.run(None, {sess.get_inputs()[0].name:
                          np.asarray(x, np.float32)})[0]
    want = np.asarray(fn(x), np.float32)
    err = float(np.max(np.abs(got - want)))
    if err > atol:
        raise AssertionError(
            f"ONNX replay mismatch: max|delta|={err:.3e} > atol={atol}")
    return err
