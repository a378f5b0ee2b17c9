"""Dataset spectrum analysis (reference repl/dataset_spectre.py).

Grayscale fft2 of dataset images -> frequency-radius vs magnitude scatter
(dataset_spectre.py:31-94) and a spectrum-magnitude histogram (:108-115).
Reads nuScenes ``samples/CAM_FRONT/*.jpg`` when a dataset root is given
(cv2, like the reference), else falls back to the hermetic synthetic set so
the analysis runs anywhere.

    python -m spectre_tpu.repl.dataset_spectre [--data-root /path/to/nuscenes]
"""

from __future__ import annotations

import argparse
import glob
import os

import jax.numpy as jnp
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _load_images(data_root: str | None, limit: int):
    if data_root:
        paths = sorted(glob.glob(os.path.join(
            data_root, "samples", "CAM_FRONT", "*.jpg")))[:limit]
        if paths:
            import cv2

            return [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2GRAY) / 255.0
                    for p in paths]
    from spectre_tpu.data import load_dataset

    x, _ = load_dataset("cifar100", "train", data_dir=data_root or "/nonexistent")
    return [img.mean(0) for img in x[:limit]]  # grayscale


def radial_profile(spec: np.ndarray):
    h, w = spec.shape
    cy, cx = h // 2, w // 2
    y, x = np.mgrid[0:h, 0:w]
    r = np.sqrt((y - cy) ** 2 + (x - cx) ** 2).astype(np.int32)
    mags = np.zeros(r.max() + 1)
    counts = np.bincount(r.ravel())
    np.add.at(mags, r.ravel(), spec.ravel())
    return mags / np.maximum(counts, 1)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", default=None)
    p.add_argument("--limit", type=int, default=32)
    p.add_argument("--out", default="plots")
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    images = _load_images(args.data_root, args.limit)
    profiles = []
    all_mags = []
    for img in images:
        spec = np.fft.fftshift(np.abs(np.asarray(
            jnp.fft.fft2(jnp.asarray(img, jnp.float32)))))
        profiles.append(radial_profile(spec))
        all_mags.append(spec.ravel())
    max_len = max(len(pr) for pr in profiles)
    mean_profile = np.zeros(max_len)
    for pr in profiles:
        mean_profile[: len(pr)] += pr
    mean_profile /= len(profiles)

    fig, ax = plt.subplots(1, 2, figsize=(11, 4))
    ax[0].semilogy(mean_profile)
    ax[0].set_xlabel("frequency radius"); ax[0].set_ylabel("mean |FFT|")
    ax[0].set_title(f"radial spectrum, {len(images)} images")
    ax[1].hist(np.log1p(np.concatenate(all_mags)), bins=80)
    ax[1].set_title("log1p|FFT| histogram")
    fig.tight_layout()
    fig.savefig(f"{args.out}/dataset_spectrum.png", dpi=100)
    plt.close(fig)
    print(f"analyzed {len(images)} images -> {args.out}/dataset_spectrum.png")
    print(f"energy below radius 8: "
          f"{mean_profile[:8].sum() / mean_profile.sum() * 100:.1f}%")


if __name__ == "__main__":
    main()
