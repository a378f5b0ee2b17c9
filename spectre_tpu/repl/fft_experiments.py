"""FFT / Hadamard feature visualization study (reference repl/fft_experiments.py).

Reproduces the reference's experiments TPU-natively and writes figures to
plots/: (a) 1D FFT of a synthetic sine mix + top-k energy bins
(fft_experiments.py:12-37); (b) token-space FFT of an image through a
PatchEmbedding with projection forced to 1.0 (:43-146); (c) FWHT of an image
via the first-party FWHT (the reference imported the CUDA
fast_hadamard_transform package, :149-173); (d) the shifted-sigmoid threshold
curve (:175-186); (e) rfft2 shape checks (:188-209).

    python -m spectre_tpu.repl.fft_experiments [--out plots]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from spectre_tpu.ops import fwht, next_pow2, rfft_real  # noqa: E402


def _test_image(size: int = 64) -> np.ndarray:
    """Deterministic synthetic 'photo': gradients + circles + texture."""
    y, x = np.mgrid[0:size, 0:size] / size
    img = 0.5 + 0.3 * np.sin(8 * np.pi * x) * np.cos(6 * np.pi * y)
    img += 0.2 * (((x - 0.5) ** 2 + (y - 0.5) ** 2) < 0.1)
    rng = np.random.default_rng(0)
    img += 0.05 * rng.standard_normal((size, size))
    return np.clip(img, 0, 1).astype(np.float32)


def sine_fft(out: str):
    t = np.linspace(0, 1, 512, endpoint=False).astype(np.float32)
    sig = (np.sin(2 * np.pi * 5 * t) + 0.5 * np.sin(2 * np.pi * 23 * t)
           + 0.25 * np.sin(2 * np.pi * 57 * t))
    spec = np.abs(np.asarray(jnp.fft.rfft(jnp.asarray(sig))))
    top = np.argsort(spec)[::-1][:5]
    print(f"top-5 energy bins: {sorted(top.tolist())} "
          f"(expected around 5, 23, 57)")
    fig, ax = plt.subplots(2, 1, figsize=(8, 5))
    ax[0].plot(t, sig); ax[0].set_title("signal")
    ax[1].stem(spec); ax[1].set_title("|rfft|")
    fig.tight_layout(); fig.savefig(f"{out}/sine_fft.png", dpi=100); plt.close(fig)


def token_space_fft(out: str):
    """Patch-embed an image with all-ones projection, FFT the token sequence
    (reference :43-146 forced weights to 1.0 to visualize token-space FFT)."""
    img = _test_image(64)
    P = 8
    patches = img.reshape(8, P, 8, P).transpose(0, 2, 1, 3).reshape(64, P * P)
    tokens = patches.sum(-1)  # all-ones projection
    spec = np.asarray(rfft_real(jnp.asarray(tokens)))
    fig, ax = plt.subplots(1, 3, figsize=(12, 4))
    ax[0].imshow(img, cmap="gray"); ax[0].set_title("image")
    ax[1].plot(tokens); ax[1].set_title("token sequence (1.0-proj)")
    ax[2].plot(spec); ax[2].set_title("Re rfft(tokens)")
    fig.tight_layout(); fig.savefig(f"{out}/token_example.png", dpi=100); plt.close(fig)


def hadamard_image(out: str):
    img = _test_image(64)
    row_len = next_pow2(img.shape[-1])
    x = jnp.asarray(np.pad(img, ((0, 0), (0, row_len - img.shape[-1]))))
    h = np.asarray(fwht(x))
    fig, ax = plt.subplots(1, 2, figsize=(9, 4))
    ax[0].imshow(img, cmap="gray"); ax[0].set_title("image")
    ax[1].imshow(np.log1p(np.abs(h)), cmap="magma")
    ax[1].set_title("log1p|FWHT(rows)|")
    fig.tight_layout(); fig.savefig(f"{out}/hadamard_image.png", dpi=100); plt.close(fig)


def shifted_sigmoid(out: str):
    """Sharp learned-threshold gate curve (reference LearnedSigmoid,
    layers.py:124-133 and the plot at fft_experiments.py:175-186)."""
    x = np.linspace(-2, 2, 500)
    t, sharp = 0.5, 5000.0
    y = 1.0 / (1.0 + np.exp((x + t) / np.sqrt(t * t / sharp)))
    fig, ax = plt.subplots(figsize=(6, 3))
    ax.plot(x, y); ax.set_title(f"shifted sigmoid (t={t}, sharpness={sharp})")
    fig.tight_layout(); fig.savefig(f"{out}/shifted_sigmoid.png", dpi=100); plt.close(fig)


def rfft2_shapes():
    x = jnp.zeros((2, 3, 16, 16))
    print("rfft2 shape checks:")
    print("  rfft2(16x16) ->", jnp.fft.rfft2(x).shape, "(last dim 16//2+1)")
    print("  fft2(16x16)  ->", jnp.fft.fft2(x).shape)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="plots")
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    sine_fft(args.out)
    token_space_fft(args.out)
    hadamard_image(args.out)
    shifted_sigmoid(args.out)
    rfft2_shapes()
    print(f"figures in {args.out}/")


if __name__ == "__main__":
    main()
