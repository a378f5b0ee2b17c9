"""Smoke tests for the study/driver entry points (tiny args, CPU)."""

import os

import numpy as np
import pytest


def test_fft_approx_study(capsys):
    from spectre_tpu.repl.fft_approx import main

    main(["--dim", "32", "--steps", "30", "--batch", "32"])
    out = capsys.readouterr().out
    assert "final mse" in out and "rfft" in out


def test_fft_experiments(tmp_path):
    from spectre_tpu.repl.fft_experiments import main

    main(["--out", str(tmp_path)])
    for f in ["sine_fft.png", "token_example.png", "hadamard_image.png",
              "shifted_sigmoid.png"]:
        assert (tmp_path / f).exists()


def test_dwt_experiments(tmp_path, capsys):
    from spectre_tpu.repl.dwt_experiments import main

    main(["--out", str(tmp_path), "--levels", "2"])
    assert (tmp_path / "dwt_subbands.png").exists()
    assert "perfect reconstruction" in capsys.readouterr().out


def test_dataset_spectre(tmp_path, capsys):
    from spectre_tpu.repl.dataset_spectre import main

    main(["--out", str(tmp_path), "--limit", "4"])
    assert (tmp_path / "dataset_spectrum.png").exists()


def test_mnist_submission(tmp_path):
    from spectre_tpu.repl.mnist_submission import main

    out = tmp_path / "submission.csv"
    grid = tmp_path / "grid.png"
    main(["--synthetic", "--steps", "2", "--out", str(out), "--grid", str(grid),
          "--set", "batch_size=16", "val_batch_size=64", "epochs=1",
          "num_encoders=1", "embed_dim=16", "hidden_dim=32"])
    assert out.exists() and grid.exists()
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "ImageId,Label"
    assert len(lines) > 1


def test_export_and_stablehlo_infer(tmp_path, capsys):
    from spectre_tpu.repl.export import main as export_main
    from spectre_tpu.repl.infer import main as infer_main

    outdir = str(tmp_path / "export")
    export_main(["--config", "spectre_tpu/configs/spectre_vit_mnist.py",
                 "--outdir", outdir, "--batch", "2",
                 "--set", "num_encoders=1", "embed_dim=16", "hidden_dim=32",
                 "img_size=8", "compute_dtype=float32"])
    logits = infer_main(["--artifact", f"{outdir}/model.stablehlo",
                         "--input", f"{outdir}/example_input.f32",
                         "--batch", "2", "--channels", "1", "--size", "8",
                         "--expect", f"{outdir}/example_logits.f32"])
    assert np.asarray(logits).shape == (2, 10)


def test_sign_permute_mix(rng):
    import jax
    import jax.numpy as jnp

    from spectre_tpu.models import SignPermuteMix

    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    mod = SignPermuteMix(embed_dim=8, token_dim=5)
    v = mod.init(jax.random.key(0), x)
    y = mod.apply(v, x)
    assert y.shape == x.shape
    # orthogonal: norms preserved
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y).reshape(2, -1), axis=-1),
        np.linalg.norm(np.asarray(x).reshape(2, -1), axis=-1), rtol=1e-5)
