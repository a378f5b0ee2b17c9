import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectre_tpu.data import (
    BatchIterator,
    load_dataset,
    make_eval_transform,
    make_train_augment,
    normalize,
    prefetch_to_mesh,
)
from spectre_tpu.data.augment import (
    color_jitter,
    gaussian_blur,
    random_erasing,
    random_hflip,
    random_rotate,
    resize_bilinear,
)
from spectre_tpu.parallel import create_mesh


def test_synthetic_datasets_shapes():
    x, y = load_dataset("mnist", "train", data_dir="/nonexistent")
    assert x.shape[1:] == (1, 28, 28) and x.dtype == np.float32
    assert y.dtype == np.int32 and y.min() >= 0 and y.max() < 10
    x, y = load_dataset("cifar100", "test", data_dir="/nonexistent")
    assert x.shape[1:] == (3, 32, 32)
    assert y.max() < 100


def test_synthetic_is_deterministic():
    x1, y1 = load_dataset("mnist", "train", data_dir="/nonexistent")
    x2, y2 = load_dataset("mnist", "train", data_dir="/nonexistent")
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)


def test_batch_iterator_train_drops_and_shuffles():
    x = np.arange(10, dtype=np.float32).reshape(10, 1, 1, 1)
    y = np.arange(10, dtype=np.int32)
    it = BatchIterator(x, y, 4, shuffle=True, seed=0)
    batches = list(it)
    assert len(batches) == 2 and len(it) == 2
    first_epoch = np.concatenate([b["label"] for b in batches])
    second_epoch = np.concatenate([b["label"] for b in it])
    assert not np.array_equal(first_epoch, second_epoch)  # reshuffled


def test_batch_iterator_eval_pads():
    x = np.zeros((10, 1, 2, 2), np.float32)
    y = np.arange(10, dtype=np.int32)
    batches = list(BatchIterator(x, y, 4, shuffle=False))
    assert [int(b["valid"]) for b in batches] == [4, 4, 2]
    assert all(b["image"].shape == (4, 1, 2, 2) for b in batches)


def test_prefetch_to_mesh_shards_batch(devices):
    mesh = create_mesh(devices)
    x = np.random.default_rng(0).normal(size=(16, 1, 4, 4)).astype(np.float32)
    y = np.zeros(16, np.int32)
    out = list(prefetch_to_mesh(BatchIterator(x, y, 8, shuffle=False), mesh))
    assert len(out) == 2
    img = out[0]["image"]
    assert img.shape == (8, 1, 4, 4)
    # sharded over the data axis: 8 shards of batch 1
    assert len(img.sharding.device_set) == 8


def test_normalize_and_eval_transform(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 4, 4)).astype(np.float32))
    out = normalize(x, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    np.testing.assert_allclose(
        np.asarray(out), (np.asarray(x) - 0.5) / 0.25, rtol=1e-6)
    t = make_eval_transform((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    np.testing.assert_allclose(np.asarray(t(x)), np.asarray(out), rtol=1e-6)


def test_random_hflip_flips_exactly(rng):
    x = jnp.asarray(rng.uniform(0, 1, (8, 1, 4, 4)).astype(np.float32))
    always = random_hflip(jax.random.key(0), x, p=1.0)
    np.testing.assert_allclose(np.asarray(always), np.asarray(x)[..., ::-1])
    never = random_hflip(jax.random.key(0), x, p=0.0)
    np.testing.assert_allclose(np.asarray(never), np.asarray(x))


def test_random_rotate_zero_degrees_identity(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 8, 8)).astype(np.float32))
    out = random_rotate(jax.random.key(0), x, degrees=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_batched_nearest_rotate_matches_per_image_reference(rng):
    """The production per-channel flat-gather path (one shared [B*H*W] index
    vector — benchmarks/rotate_variants.py) must be bitwise-identical to the
    simple vmapped per-image formulation it replaced."""
    from spectre_tpu.data.augment import _rotate_nearest

    x = jnp.asarray(rng.uniform(0, 1, (6, 3, 16, 16)).astype(np.float32))
    key = jax.random.key(7)
    out = random_rotate(key, x, degrees=30.0, interpolation="nearest")
    angles = jax.random.uniform(key, (6,), minval=-30.0, maxval=30.0) * (
        np.pi / 180.0)
    ref = jax.vmap(_rotate_nearest)(x, angles.astype(x.dtype))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_rotate_180_reverses():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 1, 4, 4)
    from spectre_tpu.data.augment import _rotate_bilinear
    out = _rotate_bilinear(x[0], jnp.asarray(np.pi, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[0])[:, ::-1, ::-1], atol=1e-4)


def test_gaussian_blur_preserves_mean(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 8, 8)).astype(np.float32))
    out = gaussian_blur(jax.random.key(0), x)
    assert out.shape == x.shape
    # blur with edge zero-padding can only slightly reduce total mass
    assert np.asarray(out).mean() <= np.asarray(x).mean() + 1e-5
    # constant image away from borders stays constant
    const = jnp.ones((1, 1, 8, 8))
    blurred = gaussian_blur(jax.random.key(1), const)
    np.testing.assert_allclose(np.asarray(blurred)[..., 1:-1, 1:-1], 1.0, atol=1e-5)


def test_random_erasing_zeroes_a_rect(rng):
    x = jnp.ones((4, 3, 16, 16))
    out = np.asarray(random_erasing(jax.random.key(3), x, p=1.0))
    assert (out == 0).any(axis=(1, 2, 3)).all()  # every sample has a hole
    assert (out == 1).any()  # but not everything erased


def test_color_jitter_identity_at_zero(rng):
    x = jnp.asarray(rng.uniform(0.2, 0.8, (2, 3, 4, 4)).astype(np.float32))
    out = color_jitter(jax.random.key(0), x, 0.0, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_train_augment_pipeline_runs(rng):
    aug = make_train_augment((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    x = jnp.asarray(rng.uniform(0, 1, (4, 3, 16, 16)).astype(np.float32))
    out = aug(jax.random.key(0), x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # stochastic: two keys differ
    out2 = aug(jax.random.key(1), x)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_resize_bilinear_teacher_path(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32))
    out = resize_bilinear(x, 224)
    assert out.shape == (2, 3, 224, 224)
    # the separable-GEMM formulation must be the exact same linear operator
    # as jax.image.resize (derived from it via identity matrices)
    want = jax.image.resize(x, (2, 3, 224, 224), method="bilinear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # downsample path too (repl pipelines resize both directions)
    big = jnp.asarray(rng.uniform(0, 1, (2, 3, 224, 224)).astype(np.float32))
    got = resize_bilinear(big, 32)
    want = jax.image.resize(big, (2, 3, 32, 32), method="bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_cifar100_binary_format_loader(tmp_path):
    """Python fallback decode of the cifar-100-binary format (the native C++
    decoder covers the same format; tests/test_native.py)."""
    rng = np.random.default_rng(0)
    d = tmp_path / "cifar-100-binary"
    d.mkdir()
    recs, labels = [], []
    for i in range(6):
        fine = (7 * i) % 100
        px = rng.integers(0, 256, 3072, dtype=np.uint8)
        recs.append(bytes([i % 20, fine]) + px.tobytes())
        labels.append(fine)
    (d / "train.bin").write_bytes(b"".join(recs))
    x, y = load_dataset("cifar100", "train", data_dir=str(tmp_path))
    assert x.shape == (6, 3, 32, 32)
    np.testing.assert_array_equal(y, np.asarray(labels, np.int32))
