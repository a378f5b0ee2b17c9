"""CI smoke for the real-data reproduction harness (repl/reproduce.py).

Runs BOTH sides — the actual /root/reference torch recipe and the
spectre_tpu trainer — for a few steps on hermetic synthetic data with a
tiny model, and checks the report contract (the fields BASELINE.md's
one-command parity run documents). The real run needs $SPECTRE_DATA_DIR;
this proves the harness is executable end-to-end the day data appears.
"""

import os

import pytest


def test_reproduce_smoke(tmp_path):
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout not present")
    pytest.importorskip("torch")
    from spectre_tpu.repl.reproduce import main

    out = str(tmp_path / "report.json")
    # mix_block=32 DIVIDES this smoke geometry's d = 17*32 = 544, so the
    # primary leg genuinely trains block-structured tables (no silent
    # uniform fallback — asserted below) and the harness's uniform leg
    # (mix_block=0, VERDICT r3 #1) runs as the second spectre_tpu arm
    import warnings

    with warnings.catch_warnings():
        warnings.filterwarnings(
            "error", message=".*sampling UNIFORM permutation tables.*")
        report = main([
            "--config", "spectre_tpu/configs/spectre_vit_cifar100.py",
            "--synthetic", "--steps", "2", "--out", out,
            "--set", "batch_size=16", "val_batch_size=64", "epochs=1",
            "embed_dim=32", "num_encoders=1", "num_heads=2", "hidden_dim=32",
            "img_size=16", "patch_size=4", "compute_dtype=float32",
            "mix_block=32",
        ])
    assert {"torch_top1", "tpu_top1", "top1_delta", "within_0.2pct",
            "torch_img_per_sec", "tpu_img_per_sec_chip"} <= set(report)
    assert report["tpu_mix_block"] == 32
    assert {"tpu_top1_uniform", "top1_delta_uniform",
            "within_0.2pct_uniform"} <= set(report)
    assert 0.0 <= report["torch_top1"] <= 1.0
    assert 0.0 <= report["tpu_top1"] <= 1.0
    assert 0.0 <= report["tpu_top1_uniform"] <= 1.0
    assert os.path.exists(out)
