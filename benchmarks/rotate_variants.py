"""Nearest-neighbor rotation resample formulations, microbenched.

The augmentation's per-pixel gather (``img[:, yc, xc]`` vmapped over B) was
8.5 ms/step at B=1024 — the largest single op of the flagship train step
(benchmarks/v5e_train_step_ops_r2final.csv, fusion.70: XLA lays the
[B*H*W, C] gather result pixel-minor, so every pixel is 3 strided 4 B
reads). This harness times layout/formulation alternatives that keep the
exact same nearest-neighbor semantics.

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/rotate_variants.py
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.repl.perf import _time_fn


def coords(B, H, W, key):
    angles = jax.random.uniform(key, (B,), minval=-0.52, maxval=0.52)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] - cy
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(angles)[:, None, None], jnp.sin(angles)[:, None, None]
    sy = cos * ys + sin * xs + cy
    sx = -sin * ys + cos * xs + cx
    yi, xi = jnp.round(sy), jnp.round(sx)
    valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
    yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
    xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
    return yc, xc, valid


def current(x, yc, xc, valid):
    """Production path: channel-first advanced indexing, vmapped."""
    def one(img, y, xx, v):
        return jnp.where(v[None], img[:, y, xx], 0.0)
    return jax.vmap(one)(x, yc, xc, valid)


def channels_last(x, yc, xc, valid):
    """Gather [C]-contiguous pixels from [H, W, C]."""
    xl = x.transpose(0, 2, 3, 1)  # [B, H, W, C]
    def one(img, y, xx, v):
        return jnp.where(v[..., None], img[y, xx], 0.0)
    out = jax.vmap(one)(xl, yc, xc, valid)
    return out.transpose(0, 3, 1, 2)


def flat_rows(x, yc, xc, valid):
    """ONE flat row gather: rows are [W]-pixel lines? No — exact per-pixel
    indices, but expressed as a single [B*H*W] take on the [B*H*W, C]
    channels-last table (batch offsets folded into the indices)."""
    B, C, H, W = x.shape
    xl = x.transpose(0, 2, 3, 1).reshape(B * H * W, C)
    idx = (jnp.arange(B)[:, None, None] * (H * W) + yc * W + xc).reshape(-1)
    out = jnp.take(xl, idx, axis=0).reshape(B, H, W, C)
    out = jnp.where(valid[..., None], out, 0.0)
    return out.transpose(0, 3, 1, 2)


def per_channel_flat(x, yc, xc, valid):
    """Shared flat [B*H*W] indices, one 1-D scalar gather per channel."""
    B, C, H, W = x.shape
    idx = (jnp.arange(B)[:, None, None] * (H * W) + yc * W + xc).reshape(-1)
    xf = x.transpose(1, 0, 2, 3).reshape(C, B * H * W)
    out = jax.vmap(lambda ch: jnp.take(ch, idx))(xf)
    out = out.reshape(C, B, H, W).transpose(1, 0, 2, 3)
    return jnp.where(valid[:, None], out, 0.0)


def batched_take_along(x, yc, xc, valid):
    """Batch-LOCAL flat gather: per-sample [H*W] indices via take_along_axis
    on [B, C, H*W]. Lowers to a gather with operand batching dims, which
    GSPMD partitions along the batch axis — the cross-batch flat index of
    ``per_channel_flat`` folds batch offsets into the index vector, so under
    a DP mesh GSPMD must all-gather the whole [C, B*H*W] pixel source
    (found by the round-5 collective audit of the dryrun DP leg)."""
    B, C, H, W = x.shape
    idx = (yc * W + xc).reshape(B, 1, H * W)
    xf = x.reshape(B, C, H * W)
    out = jnp.take_along_axis(
        xf, jnp.broadcast_to(idx, (B, C, H * W)), axis=2, mode="clip")
    return jnp.where(valid[:, None], out.reshape(B, C, H, W), 0.0)


def row_then_col(x, yc, xc, valid):
    """Two-stage: gather whole [W, C] rows by yc (128 B-contiguous rows),
    then per-pixel within-row take along the W axis."""
    B, C, H, W = x.shape
    xl = x.transpose(0, 2, 3, 1)  # [B, H, W, C]
    def one(img, y, xx, v):
        rows = img[y.reshape(-1)]  # [H*W, W, C] — W*C-contiguous rows
        px = jnp.take_along_axis(
            rows, xx.reshape(-1)[:, None, None].astype(jnp.int32), axis=1)
        return jnp.where(v.reshape(-1)[:, None], px[:, 0], 0.0)
    out = jax.vmap(one)(xl, yc, xc, valid)
    return out.reshape(B, H, W, C).transpose(0, 3, 1, 2)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args(argv)
    B, H = args.batch, args.size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, 3, H, H)).astype(np.float32))
    yc, xc, valid = jax.jit(functools.partial(coords, B, H, H))(jax.random.key(1))
    ref = None
    for name, fn in [("current", current), ("channels_last", channels_last),
                     ("flat_rows", flat_rows),
                     ("per_channel_flat", per_channel_flat),
                     ("batched_take_along", batched_take_along),
                     ("row_then_col", row_then_col)]:
        f = jax.jit(fn)
        out = np.asarray(f(x, yc, xc, valid))
        if ref is None:
            ref = out
        else:
            np.testing.assert_allclose(out, ref, rtol=0, atol=0)
        t = _time_fn(f, x, yc, xc, valid, iters=args.iters)
        print(f"  {name:18s}: {t * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
