"""Dataset loading: CIFAR-100, MNIST (Kaggle-CSV and IDX), synthetic.

The reference pulls CIFAR-100 through torchvision (train.py:129-145) and MNIST
through Kaggle digit-recognizer CSVs (vit_spectre_mnist.py:85-87). This image
has zero network egress, so loaders read the standard on-disk formats when
present and fall back to a deterministic synthetic set (same shapes/dtypes) so
every pipeline, test and benchmark runs hermetically.

All loaders return plain numpy: images [N, C, H, W] float32 in [0, 1],
labels [N] int32. Augmentation/normalization happens ON DEVICE
(data/augment.py) — the host does no per-sample work, unlike the reference's
16-worker CPU transform pipeline (train.py:147-155).
"""

from __future__ import annotations

import os
import pickle
import struct

import numpy as np

CIFAR100_MEAN = (0.5071, 0.4865, 0.4409)
CIFAR100_STD = (0.2673, 0.2564, 0.2762)
MNIST_MEAN = (0.1307,)
MNIST_STD = (0.3081,)


def _load_cifar100(data_dir: str, split: str):
    name = "train" if split == "train" else "test"
    pickle_path = os.path.join(data_dir, "cifar-100-python", name)
    binary_path = os.path.join(data_dir, "cifar-100-binary", f"{name}.bin")
    if os.path.exists(pickle_path):
        with open(pickle_path, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        images = d[b"data"].reshape(-1, 3, 32, 32).astype(np.float32) / 255.0
        labels = np.asarray(d[b"fine_labels"], dtype=np.int32)
        return images, labels
    if os.path.exists(binary_path):
        try:  # threaded native decode when built (make -C native)
            from spectre_tpu.data import native_loader

            if native_loader.available():
                return native_loader.load_cifar100_bin(binary_path)
        except Exception:
            pass
        raw = np.fromfile(binary_path, np.uint8).reshape(-1, 2 + 3072)
        labels = raw[:, 1].astype(np.int32)  # fine label
        images = raw[:, 2:].reshape(-1, 3, 32, 32).astype(np.float32) / 255.0
        return images, labels
    raise FileNotFoundError(pickle_path)


def _load_mnist_idx(data_dir: str, split: str):
    prefix = "train" if split == "train" else "t10k"
    with open(os.path.join(data_dir, f"{prefix}-images-idx3-ubyte"), "rb") as f:
        _, n, rows, cols = struct.unpack(">IIII", f.read(16))
        images = np.frombuffer(f.read(), dtype=np.uint8).reshape(n, 1, rows, cols)
    with open(os.path.join(data_dir, f"{prefix}-labels-idx1-ubyte"), "rb") as f:
        struct.unpack(">II", f.read(8))
        labels = np.frombuffer(f.read(), dtype=np.uint8)
    return images.astype(np.float32) / 255.0, labels.astype(np.int32)


def _load_mnist_kaggle_csv(data_dir: str, split: str):
    """Kaggle digit-recognizer format (vit_spectre_mnist.py:85-87): train.csv
    has a label column + 784 pixels; test.csv has pixels only (UNLABELED —
    it is the submission set).

    Because test.csv carries no labels, evaluation splits come from a 90/10
    holdout of train.csv (the reference does exactly this,
    vit_spectre_mnist.py:111 train_test_split) — fabricating zero labels for
    test.csv would silently corrupt val metrics and best-checkpoint
    selection. ``split="submission"`` returns the unlabeled test.csv pixels
    with labels of -1 (repl/mnist_submission.py consumes it)."""
    if split == "submission":
        raw = np.loadtxt(os.path.join(data_dir, "test.csv"), delimiter=",",
                         skiprows=1, dtype=np.float32)
        images = raw.reshape(-1, 1, 28, 28) / 255.0
        return images, np.full((raw.shape[0],), -1, np.int32)
    raw = np.loadtxt(os.path.join(data_dir, "train.csv"), delimiter=",",
                     skiprows=1, dtype=np.float32)
    labels = raw[:, 0].astype(np.int32)
    images = raw[:, 1:].reshape(-1, 1, 28, 28) / 255.0
    n_val = max(1, len(images) // 10)
    if split == "train":
        return images[:-n_val], labels[:-n_val]
    return images[-n_val:], labels[-n_val:]


def _synthetic(name: str, split: str, seed: int = 0):
    """Deterministic class-separable synthetic data with the real shapes.

    Each class gets a fixed random template; samples are template + noise, so
    a working model actually learns (useful for smoke-train convergence
    tests), at CIFAR/MNIST shapes.
    """
    if name == "cifar100":
        c, h, w, n_classes = 3, 32, 32, 100
        n = 4096 if split == "train" else 1024
    else:
        c, h, w, n_classes = 1, 28, 28, 10
        n = 4096 if split == "train" else 1024
    rng = np.random.default_rng(seed + (0 if split == "train" else 1))
    templates = np.random.default_rng(seed).uniform(0.1, 0.9, (n_classes, c, h, w)).astype(np.float32)
    labels = rng.integers(0, n_classes, n).astype(np.int32)
    images = templates[labels] + rng.normal(0, 0.15, (n, c, h, w)).astype(np.float32)
    return np.clip(images, 0.0, 1.0), labels


def load_dataset(name: str, split: str = "train", data_dir: str | None = None,
                 allow_synthetic: bool = True):
    """Load ``cifar100`` or ``mnist``; returns (images [N,C,H,W] f32, labels [N] i32).

    Search order: explicit ``data_dir`` -> $SPECTRE_DATA_DIR -> ./data ->
    synthetic fallback (if allowed).
    """
    candidates = [d for d in (data_dir, os.environ.get("SPECTRE_DATA_DIR"), "data") if d]
    for d in candidates:
        try:
            if name == "cifar100":
                return _load_cifar100(d, split)
            if name == "mnist":
                if os.path.exists(os.path.join(d, "train.csv")):
                    return _load_mnist_kaggle_csv(d, split)
                return _load_mnist_idx(d, split)
        except (FileNotFoundError, NotADirectoryError):
            continue
    if not allow_synthetic:
        raise FileNotFoundError(f"dataset {name!r} not found in {candidates}")
    return _synthetic(name, split)
