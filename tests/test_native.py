"""Native runtime parity: the C++ inference runner and data loader must match
the JAX/python implementations exactly (SURVEY.md §2.2 "ghost Rust inference
crate" capability — here a first-party C++ runner)."""

import os
import struct
import subprocess
from types import SimpleNamespace

import numpy as np
import pytest

from conftest import tiny_export_cfg as _cfg  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def native_built(native_build):
    return native_build


@pytest.mark.parametrize("mix_impl,mix_block", [
    ("gather", 0), ("structured", 0),
    # block-structured tables (d=80, blk=8): the native runner detects the
    # block structure and takes the contiguous copy+sign fast path — this
    # case pins that path's numerics against JAX (it is bit-identical to
    # the scalar gather by construction, but only if detection is right)
    ("gather", 8),
])
def test_cpp_inference_matches_jax(native_built, tmp_path, mix_impl, mix_block):
    from spectre_tpu.repl.export import export_from_config

    outdir = str(tmp_path / f"export_{mix_impl}_b{mix_block}")
    cfg = _cfg(mix_impl=mix_impl, mix_block=mix_block)
    export_from_config(cfg, outdir=outdir, batch=3)
    if mix_block:
        # guard against the silent-uniform fallback: the exported model must
        # actually have sampled block tables, or this case tests nothing new
        import jax
        import jax.numpy as jnp
        from spectre_tpu.models import build_model
        from spectre_tpu.ops.fused_mix import _walk_mix_tables
        from spectre_tpu.ops.permute import detect_block_size
        m = build_model(cfg)
        v = m.init(jax.random.key(cfg.random_seed),
                   jnp.zeros((1, cfg.in_channels, cfg.img_size, cfg.img_size)))
        perms = np.asarray(next(t for _, t in _walk_mix_tables(v)))
        assert detect_block_size(perms, min_blk=8) == mix_block

    runner = os.path.join(native_built, "spectre_infer")
    r = subprocess.run(
        [runner, "--weights", f"{outdir}/weights.stw", "--meta", f"{outdir}/meta.txt",
         "--input", f"{outdir}/example_input.f32", "--batch", "3",
         "--out", f"{outdir}/native_logits.f32"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    got = np.fromfile(f"{outdir}/native_logits.f32", np.float32).reshape(3, 10)
    want = np.fromfile(f"{outdir}/example_logits.f32", np.float32).reshape(3, 10)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert (np.argmax(got, -1) == np.argmax(want, -1)).all()


def test_native_dataio_cifar_decode(native_built, tmp_path):
    from spectre_tpu.data import native_loader

    assert native_loader.available()
    # synthesize a 5-record cifar-100-binary file
    rng = np.random.default_rng(0)
    path = tmp_path / "train.bin"
    records = []
    labels = []
    pixels = []
    for i in range(5):
        coarse, fine = i % 20, (3 * i) % 100
        px = rng.integers(0, 256, 3072, dtype=np.uint8)
        records.append(bytes([coarse, fine]) + px.tobytes())
        labels.append(fine)
        pixels.append(px)
    path.write_bytes(b"".join(records))
    images, got_labels = native_loader.load_cifar100_bin(str(path))
    assert images.shape == (5, 3, 32, 32)
    np.testing.assert_array_equal(got_labels, np.asarray(labels, np.int32))
    np.testing.assert_allclose(
        images[2].ravel(), pixels[2].astype(np.float32) / 255.0, rtol=1e-6)


def test_native_dataio_mnist_idx(native_built, tmp_path):
    from spectre_tpu.data import native_loader

    rng = np.random.default_rng(1)
    n, rows, cols = 7, 28, 28
    img = rng.integers(0, 256, (n, rows, cols), dtype=np.uint8)
    lab = rng.integers(0, 10, n, dtype=np.uint8)
    ip = tmp_path / "train-images-idx3-ubyte"
    lp = tmp_path / "train-labels-idx1-ubyte"
    ip.write_bytes(struct.pack(">IIII", 0x803, n, rows, cols) + img.tobytes())
    lp.write_bytes(struct.pack(">II", 0x801, n) + lab.tobytes())
    images, labels = native_loader.load_mnist_idx(str(ip), str(lp))
    assert images.shape == (n, 1, 28, 28)
    np.testing.assert_array_equal(labels, lab.astype(np.int32))
    np.testing.assert_allclose(images[3, 0], img[3] / 255.0, rtol=1e-6)


def test_native_gather_batch(native_built):
    from spectre_tpu.data import native_loader

    rng = np.random.default_rng(2)
    images = rng.normal(size=(10, 1, 4, 4)).astype(np.float32)
    labels = np.arange(10, dtype=np.int32)
    perm = np.asarray([7, 2, 9, 0], np.int64)
    bi, bl = native_loader.gather_batch(images, labels, perm)
    np.testing.assert_array_equal(bl, labels[perm])
    np.testing.assert_array_equal(bi, images[perm])
