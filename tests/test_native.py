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


def _has_vnni() -> bool:
    try:
        with open("/proc/cpuinfo") as f:
            return "avx512_vnni" in f.read()
    except OSError:
        return False


def test_int8_runner_close_to_f32_and_argmax_agrees(native_built, tmp_path):
    """Opt-in int8 (VNNI) path: per-channel s8 weights + per-row dynamic u8
    activations must track the f32 runner closely and preserve argmax.
    SPECTRE_INT8_ALL drops the size floor so the quantized kernels engage
    at this tiny geometry (the production gate only quantizes the wide
    encoder GEMMs)."""
    if not _has_vnni():
        pytest.skip("host has no AVX512-VNNI")
    from spectre_tpu.repl.export import export_from_config

    outdir = str(tmp_path / "export_int8")
    # mix_block=8: block-structured tables (the flagship default's shape),
    # composing the contiguous copy+sign fast path with the int8 GEMMs
    export_from_config(_cfg(mix_block=8), outdir=outdir, batch=3)
    runner = os.path.join(native_built, "spectre_infer")
    base = [runner, "--weights", f"{outdir}/weights.stw",
            "--meta", f"{outdir}/meta.txt",
            "--input", f"{outdir}/example_input.f32", "--batch", "3"]
    r = subprocess.run(base + ["--out", f"{outdir}/f32.bin"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    env = dict(os.environ, SPECTRE_INT8_ALL="1")
    r = subprocess.run(base + ["--int8", "1", "--out", f"{outdir}/i8.bin"],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    f32 = np.fromfile(f"{outdir}/f32.bin", np.float32).reshape(3, -1)
    i8 = np.fromfile(f"{outdir}/i8.bin", np.float32).reshape(3, -1)
    # quantization error bound: logits live on an O(1) scale here; the
    # observed max deviation is ~1e-2 — assert 5x headroom, not bitwise
    np.testing.assert_allclose(i8, f32, atol=5e-2)
    assert (np.argmax(i8, -1) == np.argmax(f32, -1)).all()


def test_int8_serving_daemon(native_built, tmp_path):
    """--int8 plumbs through start_server and serves logits that match the
    exported JAX reference within quantization tolerance."""
    if not _has_vnni():
        pytest.skip("host has no AVX512-VNNI")
    from spectre_tpu.repl.export import export_from_config
    from spectre_tpu.serving import SpectreClient, start_server

    outdir = str(tmp_path / "export_int8_srv")
    export_from_config(_cfg(), outdir=outdir, batch=3)
    binary = os.path.join(native_built, "spectre_serve")
    env_had = os.environ.get("SPECTRE_INT8_ALL")
    os.environ["SPECTRE_INT8_ALL"] = "1"
    try:
        proc, port = start_server(outdir, binary=binary, int8=True)
    finally:
        if env_had is None:
            os.environ.pop("SPECTRE_INT8_ALL", None)
        else:
            os.environ["SPECTRE_INT8_ALL"] = env_had
    try:
        x = np.fromfile(f"{outdir}/example_input.f32", np.float32)
        x = x.reshape(3, 3, 8, 8)
        with SpectreClient(port=port) as c:
            got = c.infer(x)
        want = np.fromfile(f"{outdir}/example_logits.f32",
                           np.float32).reshape(3, -1)
        np.testing.assert_allclose(got, want, atol=5e-2)
        assert (np.argmax(got, -1) == np.argmax(want, -1)).all()
    finally:
        proc.kill()
        proc.wait()


@pytest.mark.slow
def test_int8_argmax_agreement_on_trained_model(native_built, tmp_path):
    """Quantization accuracy on a TRAINED model, not just random init: train
    the tiny config for a few synthetic steps, export the checkpoint, and
    require near-total argmax agreement between the f32 and int8 runners
    over a 64-sample batch (trained logit margins must dominate the ~1e-2
    quantization noise)."""
    if not _has_vnni():
        pytest.skip("host has no AVX512-VNNI")
    from spectre_tpu.repl.export import export_from_config
    from spectre_tpu.train.loop import train_from_config

    # dataset=cifar100: synthetic data is 3-channel (the tiny export cfg is
    # 3x8x8; the mnist synthetic stream is 1-channel and would not feed it).
    # num_classes must stay 100 to match the synthetic label range.
    cfg = _cfg(checkpoint_dir=str(tmp_path / "ckpt"), batch_size=16,
               dataset="cifar100", num_classes=100)
    train_from_config(cfg, max_steps=12, synthetic=True, checkpoint=True,
                      write_metrics=False)
    # checkpoints land under {checkpoint_dir}/{experiment_name}/ckpt
    import glob
    ckpt_dirs = glob.glob(str(tmp_path / "ckpt" / "*" / "ckpt"))
    assert len(ckpt_dirs) == 1, ckpt_dirs
    outdir = str(tmp_path / "export_trained")
    export_from_config(cfg, checkpoint=ckpt_dirs[0], outdir=outdir, batch=2)

    rng = np.random.default_rng(7)
    batch = rng.uniform(0, 1, (64, 3, 8, 8)).astype(np.float32)
    inp = str(tmp_path / "b64.f32")
    batch.tofile(inp)
    runner = os.path.join(native_built, "spectre_infer")
    base = [runner, "--weights", f"{outdir}/weights.stw",
            "--meta", f"{outdir}/meta.txt", "--input", inp, "--batch", "64"]
    r = subprocess.run(base + ["--out", f"{outdir}/f32.bin"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    env = dict(os.environ, SPECTRE_INT8_ALL="1")
    r = subprocess.run(base + ["--int8", "1", "--out", f"{outdir}/i8.bin"],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    f32 = np.fromfile(f"{outdir}/f32.bin", np.float32).reshape(64, -1)
    i8 = np.fromfile(f"{outdir}/i8.bin", np.float32).reshape(64, -1)
    agree = (f32.argmax(-1) == i8.argmax(-1)).mean()
    assert agree >= 62 / 64, f"argmax agreement {agree:.3f}"
    np.testing.assert_allclose(i8, f32, atol=8e-2)
