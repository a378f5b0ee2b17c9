"""Device-side augmentation graph.

The reference augments on the host with torchvision + 16 DataLoader worker
processes (train.py:102-114,147-155): RandomHorizontalFlip, ColorJitter,
RandomGrayscale, RandomAffine(30), GaussianBlur, Normalize (dataset stats),
RandomErasing; MNIST uses RandomRotation(15) (vit_spectre_mnist.py:117-184).

TPU-native replacement: every transform is a pure jittable function over the
whole [B, C, H, W] batch with a single PRNG key, compiled into the train step
(or the prefetch stage), so the host moves raw uint8-scale pixels only and the
chip's VPU does the per-sample math. Exact torchvision parity is stochastic
anyway (PIL sampling differs); parity is defined at converged-accuracy level
(SURVEY.md §7 "augmentation parity").
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# ITU-R 601 luma weights (torchvision rgb_to_grayscale convention).
_LUMA = (0.299, 0.587, 0.114)


def normalize(x: jnp.ndarray, mean: Sequence[float], std: Sequence[float]) -> jnp.ndarray:
    """Channel-wise (x - mean) / std, NCHW (torchvision Normalize)."""
    m = jnp.asarray(mean, x.dtype).reshape(1, -1, 1, 1)
    s = jnp.asarray(std, x.dtype).reshape(1, -1, 1, 1)
    return (x - m) / s


def random_hflip(key: jax.Array, x: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    flip = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
    return jnp.where(flip, x[..., ::-1], x)


def _grayscale(x: jnp.ndarray) -> jnp.ndarray:
    if x.shape[1] != 3:
        return x
    w = jnp.asarray(_LUMA, x.dtype).reshape(1, 3, 1, 1)
    return jnp.sum(x * w, axis=1, keepdims=True).repeat(3, axis=1)


def random_grayscale(key: jax.Array, x: jnp.ndarray, p: float = 0.1) -> jnp.ndarray:
    on = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
    return jnp.where(on, _grayscale(x), x)


def color_jitter(
    key: jax.Array,
    x: jnp.ndarray,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.02,
) -> jnp.ndarray:
    """Brightness/contrast/saturation as torchvision-style uniform factor
    blends; hue as a YIQ-plane rotation (equivalent to HSV hue shift up to
    gamut clipping, but branch-free and VPU-friendly)."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    B = x.shape[0]
    shape = (B, 1, 1, 1)

    fb = jax.random.uniform(kb, shape, minval=1 - brightness, maxval=1 + brightness)
    x = x * fb

    fc = jax.random.uniform(kc, shape, minval=1 - contrast, maxval=1 + contrast)
    mean_gray = jnp.mean(_grayscale(x), axis=(1, 2, 3), keepdims=True)
    x = mean_gray + fc * (x - mean_gray)

    if x.shape[1] == 3:
        fs = jax.random.uniform(ks, shape, minval=1 - saturation, maxval=1 + saturation)
        gray = _grayscale(x)
        x = gray + fs * (x - gray)

        if hue > 0:
            theta = jax.random.uniform(kh, (B, 1, 1), minval=-hue, maxval=hue) * 2 * jnp.pi
            # RGB -> YIQ, rotate IQ by theta, -> RGB (fixed 3x3s fold into VPU ops)
            to_yiq = jnp.asarray(
                [[0.299, 0.587, 0.114], [0.5959, -0.2746, -0.3213], [0.2115, -0.5227, 0.3112]],
                x.dtype,
            )
            to_rgb = jnp.linalg.inv(to_yiq)
            yiq = jnp.einsum("dc,bchw->bdhw", to_yiq, x)
            cos, sin = jnp.cos(theta), jnp.sin(theta)
            i, q = yiq[:, 1], yiq[:, 2]
            yiq = jnp.stack([yiq[:, 0], cos * i - sin * q, sin * i + cos * q], axis=1)
            x = jnp.einsum("cd,bdhw->bchw", to_rgb, yiq)
    return jnp.clip(x, 0.0, 1.0)


def _src_coords(img: jnp.ndarray, angle: jnp.ndarray):
    """Inverse-map source coordinates for rotating [C, H, W] about center."""
    C, H, W = img.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jnp.arange(H, dtype=img.dtype)[:, None] - cy
    xs = jnp.arange(W, dtype=img.dtype)[None, :] - cx
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    return cos * ys + sin * xs + cy, -sin * ys + cos * xs + cx


def _gather_px(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape[1:]
    valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
    yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
    xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
    return jnp.where(valid[None], img[:, yc, xc], 0.0)


def _rotate_nearest(img: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor rotation, zero fill — torchvision ``RandomAffine``'s
    DEFAULT interpolation (reference train.py:106 uses the default). One
    gather per image instead of bilinear's four (the augment gathers were
    11% of the r2-start train step — benchmarks/v5e_train_step_ops_r2start.csv)."""
    src_y, src_x = _src_coords(img, angle)
    return _gather_px(img, jnp.round(src_y), jnp.round(src_x))


def _rotate_bilinear(img: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate one [C, H, W] image by ``angle`` (radians) about its center with
    bilinear sampling and zero padding. Static shapes; gathers are small."""
    src_y, src_x = _src_coords(img, angle)
    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = src_y - y0
    wx = src_x - x0
    out = (
        _gather_px(img, y0, x0) * (1 - wy) * (1 - wx)
        + _gather_px(img, y0, x0 + 1) * (1 - wy) * wx
        + _gather_px(img, y0 + 1, x0) * wy * (1 - wx)
        + _gather_px(img, y0 + 1, x0 + 1) * wy * wx
    )
    return out


def random_rotate(key: jax.Array, x: jnp.ndarray, degrees: float = 30.0,
                  interpolation: str = "nearest") -> jnp.ndarray:
    """RandomAffine(degrees) / RandomRotation equivalent: per-sample uniform
    rotation in [-degrees, degrees], zero fill. ``interpolation``:
    "nearest" (torchvision default, 4x fewer gathers) or "bilinear".

    The nearest path is the batched flat PER-CHANNEL gather: one shared
    [B*H*W] index vector, one 1-D scalar take per channel. The vmapped
    per-image ``img[:, yc, xc]`` formulation makes XLA emit a pixel-minor
    [B*H*W, C] gather (3 strided 4 B reads per pixel) — measured 8.7 vs
    4.8 ms at B=1024 (benchmarks/rotate_variants.py, the largest single op
    of the flagship train step before this change)."""
    B = x.shape[0]
    angles = jax.random.uniform(
        key, (B,), minval=-degrees, maxval=degrees
    ) * (jnp.pi / 180.0)
    if interpolation != "nearest":
        return jax.vmap(_rotate_bilinear)(x, angles.astype(x.dtype))
    _, C, H, W = x.shape
    src_y, src_x = jax.vmap(_src_coords)(x, angles.astype(x.dtype))
    yi, xi = jnp.round(src_y), jnp.round(src_x)
    valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
    yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
    xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
    idx = (jnp.arange(B)[:, None, None] * (H * W) + yc * W + xc).reshape(-1)
    xf = x.transpose(1, 0, 2, 3).reshape(C, B * H * W)
    out = jax.vmap(lambda ch: jnp.take(ch, idx, mode="clip"))(xf)
    out = out.reshape(C, B, H, W).transpose(1, 0, 2, 3)
    return jnp.where(valid[:, None], out, 0.0)


def gaussian_blur(
    key: jax.Array, x: jnp.ndarray, kernel_size: int = 3,
    sigma_range: tuple[float, float] = (0.1, 2.0), p: float = 1.0,
) -> jnp.ndarray:
    """Per-batch random-sigma separable Gaussian blur (torchvision
    GaussianBlur). One sigma per batch keeps it two depthwise 1D convs."""
    ks, kp = jax.random.split(key)
    sigma = jax.random.uniform(ks, (), minval=sigma_range[0], maxval=sigma_range[1])
    r = kernel_size // 2
    grid = jnp.arange(-r, r + 1, dtype=x.dtype)
    k1d = jnp.exp(-0.5 * (grid / sigma) ** 2)
    k1d = k1d / jnp.sum(k1d)
    B, C, H, W = x.shape
    xc = x.reshape(B * C, 1, H, W)
    blurred = jax.lax.conv_general_dilated(
        xc, k1d.reshape(1, 1, 1, kernel_size), (1, 1), [(0, 0), (r, r)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    blurred = jax.lax.conv_general_dilated(
        blurred, k1d.reshape(1, 1, kernel_size, 1), (1, 1), [(r, r), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    blurred = blurred.reshape(B, C, H, W)
    if p >= 1.0:
        return blurred
    on = jax.random.bernoulli(kp, p, (B, 1, 1, 1))
    return jnp.where(on, blurred, x)


def random_erasing(
    key: jax.Array, x: jnp.ndarray, p: float = 0.5,
    scale: tuple[float, float] = (0.02, 0.33),
    ratio: tuple[float, float] = (0.3, 3.3),
) -> jnp.ndarray:
    """torchvision RandomErasing: zero out a random rectangle per sample."""
    B, C, H, W = x.shape
    kon, ka, kr, ky, kx = jax.random.split(key, 5)
    area = jax.random.uniform(kon, (B,))  # reuse for on/off below
    on = area < p
    target = jax.random.uniform(ka, (B,), minval=scale[0], maxval=scale[1]) * H * W
    log_r = jax.random.uniform(
        kr, (B,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    r = jnp.exp(log_r)
    eh = jnp.clip(jnp.sqrt(target * r), 1, H).astype(jnp.int32)
    ew = jnp.clip(jnp.sqrt(target / r), 1, W).astype(jnp.int32)
    y0 = (jax.random.uniform(ky, (B,)) * (H - eh + 1)).astype(jnp.int32)
    x0 = (jax.random.uniform(kx, (B,)) * (W - ew + 1)).astype(jnp.int32)
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    mask = (
        (rows >= y0[:, None, None]) & (rows < (y0 + eh)[:, None, None])
        & (cols >= x0[:, None, None]) & (cols < (x0 + ew)[:, None, None])
        & on[:, None, None]
    )
    return jnp.where(mask[:, None], 0.0, x)


def make_train_augment(
    mean: Sequence[float], std: Sequence[float], *,
    hflip: bool = True, jitter: bool = True, grayscale_p: float = 0.2,
    degrees: float = 30.0, blur_p: float = 0.5, erasing_p: float = 0.5,
):
    """Compose the CIFAR-100 training pipeline (train.py:102-114) as one
    jittable (key, batch) -> batch function. Each knob maps 1:1 to a
    torchvision transform in the reference: ColorJitter(0.4,0.4,0.4,0.1),
    RandomGrayscale(p=0.2), RandomAffine(30) (nearest — torchvision default),
    RandomApply([GaussianBlur(3)]) (p=0.5)."""

    @jax.jit
    def augment(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        keys = jax.random.split(key, 6)
        if hflip:
            x = random_hflip(keys[0], x)
        if jitter:
            x = color_jitter(keys[1], x, 0.4, 0.4, 0.4, 0.1)
        if grayscale_p > 0:
            x = random_grayscale(keys[2], x, grayscale_p)
        if degrees > 0:
            x = random_rotate(keys[3], x, degrees)
        if blur_p > 0:
            x = gaussian_blur(keys[4], x, p=blur_p)
        x = normalize(x, mean, std)
        if erasing_p > 0:
            x = random_erasing(keys[5], x, erasing_p)
        return x

    return augment


def make_eval_transform(mean: Sequence[float], std: Sequence[float]):
    """Eval path = normalize only (train.py:117-126)."""

    @jax.jit
    def transform(x: jnp.ndarray) -> jnp.ndarray:
        return normalize(x, mean, std)

    return transform


def resize_separable(x: jnp.ndarray, size: int,
                     method: str = "bilinear") -> jnp.ndarray:
    """NCHW resize (the teacher path upsamples 32 -> 224, train.py:92-99)
    as two separable GEMMs.

    Bilinear AND bicubic resize are LINEAR operators, so their exact 1-D
    matrices are obtained by resizing identity matrices (constant-folded at
    trace time) and applied as two einsums on the MXU. ``jax.image.resize``'s
    own lowering ran at 69 ms for the 32->224 teacher view at B=256 on v5e —
    more than the ViT-S/16 teacher forward itself (54 ms); the GEMM
    formulation is bandwidth-bound on the 154 MB output instead
    (benchmarks/distill_step_bench.py before/after in BASELINE.md).
    Matches ``jax.image.resize(method=...)`` to float tolerance by
    construction (same operator, different association). ``method``:
    "bilinear" or "bicubic" (Keys a=-0.5 kernel — the same family PIL and
    torchvision use, so the reference's ``InterpolationMode.BICUBIC``
    teacher view is reproducible on-device; tests/test_distill.py holds the
    torchvision oracle to this).
    """
    B, C, H, W = x.shape
    if (H, W) == (size, size):
        return x
    jmethod = {"bilinear": "bilinear", "bicubic": "cubic"}[method]
    rh = jax.image.resize(jnp.eye(H, dtype=x.dtype), (size, H),
                          method=jmethod)
    rw = (rh if W == H else
          jax.image.resize(jnp.eye(W, dtype=x.dtype), (size, W),
                           method=jmethod))
    y = jnp.einsum("oh,bchw->bcow", rh, x)
    return jnp.einsum("pw,bcow->bcop", rw, y)


def resize_bilinear(x: jnp.ndarray, size: int) -> jnp.ndarray:
    return resize_separable(x, size, method="bilinear")


def resize_bicubic_pil(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """PIL-faithful bicubic NCHW resize for [0, 1] pixel inputs: the same
    separable-GEMM matrices as ``resize_separable(..., "bicubic")`` but
    applied in PIL's pass order — horizontal (W) first, then vertical —
    WITH a [0, 1] clip after each pass. PIL stores each resample pass as
    uint8, clamping bicubic overshoot per pass; on high-contrast pixels a
    single clip at the end differs by up to ~7% of range (measured,
    tests/test_distill.py PIL oracle at ~1 uint8 level). Used by the
    recipe-exact teacher view (distill/loop.py::make_teacher_view).
    Square inputs only (callers guard)."""
    H, W = x.shape[-2:]
    if (H, W) == (size, size):
        return x
    rw = jax.image.resize(jnp.eye(W, dtype=x.dtype), (size, W),
                          method="cubic")
    rh = (rw if H == W else
          jax.image.resize(jnp.eye(H, dtype=x.dtype), (size, H),
                           method="cubic"))
    x = jnp.clip(jnp.einsum("pw,bchw->bchp", rw, x), 0.0, 1.0)
    return jnp.clip(jnp.einsum("oh,bchp->bcop", rh, x), 0.0, 1.0)


def center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """torchvision ``CenterCrop(size)`` for NCHW batches — offset
    ``int(round((H - size) / 2))`` per axis, exactly torchvision's
    ``functional.center_crop`` arithmetic (banker's rounding included)."""
    H, W = x.shape[-2:]
    top = int(round((H - size) / 2.0))
    left = int(round((W - size) / 2.0))
    return x[..., top:top + size, left:left + size]
