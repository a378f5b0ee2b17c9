"""Model export entry point (reference repl/export.py:39-82, rebuilt).

    python -m spectre_tpu.repl.export --config spectre_tpu/configs/spectre_vit_cifar100.py \
        [--checkpoint runs/.../ckpt] [--outdir export]

Artifacts written to --outdir:
    model.stablehlo   portable serialized forward (jax.export), weights baked
    weights.stw       flat binary weights for the native C++ runner
    meta.txt          model hyperparameters (key=value) for the native runner
    example_input.f32 one example batch (raw float32 NCHW)
    example_logits.f32  reference logits for end-to-end parity checks

The StableHLO artifact is parity-verified against the live model before
writing (the analogue of the reference's onnxsim validation assert,
export.py:81).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from spectre_tpu.configs import parse_config
from spectre_tpu.export import (
    export_forward,
    save_exported,
    save_weights_bin,
    verify_export,
)
from spectre_tpu.models import build_model
from spectre_tpu.repl.train import apply_overrides

_META_KEYS = ("img_size", "patch_size", "in_channels", "num_classes",
              "embed_dim", "num_encoders", "num_heads", "hidden_dim")


def export_from_config(config, checkpoint: str | None = None,
                       outdir: str = "export", batch: int = 2,
                       onnx: bool = False):
    os.makedirs(outdir, exist_ok=True)
    model = build_model(config)
    x = np.random.default_rng(0).uniform(
        0, 1, (batch, config.in_channels, config.img_size, config.img_size)
    ).astype(np.float32)
    variables = model.init(jax.random.key(getattr(config, "random_seed", 42)),
                           jax.numpy.asarray(x))
    if checkpoint:
        from spectre_tpu.train.checkpoint import CheckpointManager
        from spectre_tpu.train.optim import make_optimizer
        from spectre_tpu.train.state import create_train_state

        tx = make_optimizer(config, steps_per_epoch=1)
        state = create_train_state(model, tx, jax.numpy.asarray(x))
        mgr = CheckpointManager(checkpoint)
        # deployment restores the BEST-metric step when one is recorded
        # (the reference exports model_best.pt, export.py:58-59), falling
        # back to latest
        best = mgr.best_step
        state = mgr.restore(
            state, step=best if best is not None else mgr.latest_step)
        variables = state.variables()

    exported = export_forward(model, variables, jax.numpy.asarray(x))
    # bf16 compute legitimately differs across compilations (fusion-dependent
    # rounding); exact parity is only promised for f32 models
    atol = 1e-5 if getattr(config, "compute_dtype", "float32") == "float32" else 5e-2
    err = verify_export(exported, model, variables, jax.numpy.asarray(x), atol=atol)
    save_exported(exported, os.path.join(outdir, "model.stablehlo"))
    save_weights_bin(variables, os.path.join(outdir, "weights.stw"))

    with open(os.path.join(outdir, "meta.txt"), "w") as f:
        for k in _META_KEYS:
            f.write(f"{k}={getattr(config, k)}\n")
        f.write(f"model={getattr(config, 'model', 'spectre_vit')}\n")
        f.write(f"method={getattr(config, 'method', 'permut_mix')}\n")
        f.write(f"mix_impl={getattr(config, 'mix_impl', 'gather')}\n")

    x.tofile(os.path.join(outdir, "example_input.f32"))
    logits = np.asarray(model.apply(variables, jax.numpy.asarray(x)))
    logits.tofile(os.path.join(outdir, "example_logits.f32"))
    print(f"exported to {outdir}/ (stablehlo parity max|delta|={err:.2e}, "
          f"{logits.shape[0]} example logits)")
    if onnx:
        # best-effort bridge for .onnx-only consumers; StableHLO+.stw is
        # the committed artifact surface (PARITY.md / export/onnx_bridge.py)
        from spectre_tpu.export.onnx_bridge import export_onnx

        onnx_err = export_onnx(model, variables, jax.numpy.asarray(x),
                               os.path.join(outdir, "model.onnx"))
        detail = ("replay max|delta|=%.2e" % onnx_err if onnx_err is not None
                  else "onnxruntime absent; replay skipped")
        print(f"onnx written ({detail})")
    return outdir


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir (best/latest restored)")
    p.add_argument("--outdir", default="export")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--onnx", action="store_true",
                   help="also write model.onnx via jax2tf->tf2onnx (needs "
                        "tf2onnx/onnx installed; see PARITY.md stance)")
    p.add_argument("--set", nargs="*", default=[])
    args = p.parse_args(argv)

    from spectre_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = apply_overrides(parse_config(args.config), args.set)
    return export_from_config(config, args.checkpoint, args.outdir,
                              args.batch, onnx=args.onnx)


if __name__ == "__main__":
    main()
