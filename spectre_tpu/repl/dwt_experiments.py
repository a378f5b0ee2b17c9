"""Wavelet (DWT) feature visualization (reference repl/dwt_experiments.py).

3-level Haar decomposition of a test image via the first-party DWT
(ops/dwt.py — the reference used pytorch_wavelets.DWTForward(J=3, "haar"),
dwt_experiments.py:56), plotting Approx/Horizontal/Vertical/Diagonal subbands
next to the fftshifted FFT magnitude for comparison.

    python -m spectre_tpu.repl.dwt_experiments [--out plots]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from spectre_tpu.ops import haar_dwt2d_multilevel, haar_idwt2d  # noqa: E402
from spectre_tpu.repl.fft_experiments import _test_image  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="plots")
    p.add_argument("--levels", type=int, default=3)
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    img = _test_image(64)
    ll, highs = haar_dwt2d_multilevel(jnp.asarray(img), args.levels)

    fig, axes = plt.subplots(args.levels, 4, figsize=(12, 3 * args.levels),
                             squeeze=False)
    approx = jnp.asarray(img)
    for lvl in range(args.levels):
        lh, hl, hh = highs[lvl]
        from spectre_tpu.ops import haar_dwt2d
        approx, _ = haar_dwt2d(approx)
        for col, (name, band) in enumerate(
                [("Approx", approx), ("H", lh), ("V", hl), ("D", hh)]):
            ax = axes[lvl][col]
            ax.imshow(np.asarray(band), cmap="gray")
            ax.set_title(f"L{lvl + 1} {name}")
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(f"{args.out}/dwt_subbands.png", dpi=100)
    plt.close(fig)

    # DWT vs FFT frequency view (reference plots them side by side)
    spec = np.fft.fftshift(np.abs(np.fft.fft2(img)))
    fig, ax = plt.subplots(1, 3, figsize=(12, 4))
    ax[0].imshow(img, cmap="gray"); ax[0].set_title("image")
    ax[1].imshow(np.asarray(ll), cmap="gray")
    ax[1].set_title(f"DWT approx (J={args.levels})")
    ax[2].imshow(np.log1p(spec), cmap="magma"); ax[2].set_title("log1p|FFT| (shifted)")
    for a in ax:
        a.axis("off")
    fig.tight_layout()
    fig.savefig(f"{args.out}/dwt_vs_fft.png", dpi=100)
    plt.close(fig)

    # perfect-reconstruction check (the property the mixers rely on)
    recon = jnp.asarray(img)
    stack = []
    cur = jnp.asarray(img)
    for lvl in range(args.levels):
        from spectre_tpu.ops import haar_dwt2d
        cur, h = haar_dwt2d(cur)
        stack.append(h)
    for h in reversed(stack):
        cur = haar_idwt2d(cur, h)
    err = float(jnp.max(jnp.abs(cur - recon)))
    print(f"perfect reconstruction max|err| = {err:.2e}")
    print(f"figures in {args.out}/")


if __name__ == "__main__":
    main()
