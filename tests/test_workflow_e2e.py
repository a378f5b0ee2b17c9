"""The full user workflow, chained end to end:

train (with checkpointing) -> resume-eval from the checkpoint -> export the
trained weights -> run the native C++ inference engine on the artifacts and
match the JAX logits. This is what a reference user does across
train.py/test.py/export.py + the ghost inference crate, as one test.
"""

import os
import subprocess
from types import SimpleNamespace

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _cfg(tmp_path):
    return SimpleNamespace(
        model="spectre_vit", method="permut_mix", dataset="mnist",
        img_size=8, patch_size=4, in_channels=1, num_classes=10,
        embed_dim=16, num_encoders=1, num_heads=2, hidden_dim=32,
        dropout=0.0, batch_size=16, val_batch_size=128, epochs=1,
        learning_rate=1e-3, random_seed=0,
        compute_dtype="float32", param_dtype="float32",
        checkpoint_dir=str(tmp_path / "runs"), keep_checkpoints=2,
        log_every=2,
    )


def test_train_checkpoint_eval_export_native(tmp_path):
    from spectre_tpu.repl.eval import evaluate
    from spectre_tpu.repl.export import export_from_config
    from spectre_tpu.train.loop import train_from_config
    from spectre_tpu.utils import experiment_name

    cfg = _cfg(tmp_path)

    # 1. train with checkpointing
    result = train_from_config(cfg, max_steps=4, synthetic=True,
                               checkpoint=True, write_metrics=True)
    ckpt_dir = os.path.join(result.logdir, "ckpt")
    assert os.path.isdir(ckpt_dir)
    assert os.path.exists(os.path.join(result.logdir, "events.jsonl"))

    # 2. standalone eval restores the checkpoint and reproduces val accuracy
    loss, acc = evaluate(cfg, checkpoint=ckpt_dir, best=True, synthetic=True)
    np.testing.assert_allclose(acc, result.best_val_accuracy, atol=1e-6)

    # 3. export the TRAINED weights (StableHLO parity-checked inside)
    outdir = str(tmp_path / "export")
    export_from_config(cfg, checkpoint=ckpt_dir, outdir=outdir, batch=2)
    for f in ("model.stablehlo", "weights.stw", "meta.txt",
              "example_input.f32", "example_logits.f32"):
        assert os.path.exists(os.path.join(outdir, f)), f

    # 4. the native C++ engine reproduces the trained model's logits
    runner = os.path.join(REPO, "native", "build", "spectre_infer")
    if not os.path.exists(runner):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [runner, "--weights", f"{outdir}/weights.stw",
         "--meta", f"{outdir}/meta.txt",
         "--input", f"{outdir}/example_input.f32", "--batch", "2",
         "--out", f"{outdir}/native_logits.f32"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    got = np.fromfile(f"{outdir}/native_logits.f32", np.float32).reshape(2, 10)
    want = np.fromfile(f"{outdir}/example_logits.f32", np.float32).reshape(2, 10)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
