"""Parity of the FFT op layer vs torch.fft conventions (the subtle part per
SURVEY.md §7: unfold ordering, norm="ortho" scaling, .real extraction)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from spectre_tpu.ops import (
    extract_patches,
    fft2_real,
    fft2_real_matmul,
    flatten_patches_cjk,
    log_magnitude_rfft2,
    patch_rfft2_real,
    rfft2_real_matrix,
    rfft_real,
    spectral_patch_matrix,
)


def test_rfft_real_matches_torch(rng):
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    expected = torch.fft.rfft(torch.from_numpy(x), dim=-1).real.numpy()
    got = np.asarray(rfft_real(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_fft2_real_matches_torch(rng):
    x = rng.standard_normal((2, 9, 12)).astype(np.float32)
    expected = torch.fft.fft2(torch.from_numpy(x)).real.numpy()
    np.testing.assert_allclose(np.asarray(fft2_real(jnp.asarray(x))), expected, rtol=1e-4, atol=1e-4)


def test_fft2_real_matmul_matches_fft(rng):
    # the MXU DFT-matmul formulation must agree with the library FFT
    x = rng.standard_normal((2, 65, 32)).astype(np.float32)
    expected = torch.fft.fft2(torch.from_numpy(x)).real.numpy()
    got = np.asarray(fft2_real_matmul(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-3)


def test_extract_patches_matches_torch_unfold(rng):
    B, C, H, W, P = 2, 3, 8, 8, 4
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    t = torch.from_numpy(x).unfold(2, P, P).unfold(3, P, P)
    expected = t.contiguous().view(B, C, -1, P, P).numpy()
    got = np.asarray(extract_patches(jnp.asarray(x), P))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("p", [2, 4, 8])
def test_patch_rfft2_real_matches_torch(p, rng):
    B, C = 2, 3
    H = W = 4 * p
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    t = torch.from_numpy(x).unfold(2, p, p).unfold(3, p, p).contiguous().view(B, C, -1, p, p)
    expected = torch.fft.rfft2(t, norm="ortho").real.numpy()
    got = np.asarray(patch_rfft2_real(jnp.asarray(x), p))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_rfft2_real_matrix_is_the_linear_map(rng):
    p = 4
    patch = rng.standard_normal((p, p)).astype(np.float32)
    d = np.asarray(rfft2_real_matrix(p))
    got = (d @ patch.reshape(-1)).reshape(p, p // 2 + 1)
    expected = torch.fft.rfft2(torch.from_numpy(patch), norm="ortho").real.numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_spectral_patch_matrix_fused_equals_naive(rng):
    """The one-GEMM fused patch embed must reproduce
    rfft2 -> freq reweight -> flatten(c,u,v) -> proj exactly."""
    B, C, P, E = 2, 3, 4, 32
    H = W = 16
    F = P // 2 + 1
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    proj_w = rng.standard_normal((C * P * F, E)).astype(np.float32) * 0.1
    fh = rng.standard_normal(P).astype(np.float32)
    fw = rng.standard_normal(F).astype(np.float32)

    # naive path (reference spectre.py:124-148 semantics)
    xf = patch_rfft2_real(jnp.asarray(x), P)  # [B, C, N, P, F]
    xf = xf * fh[None, None, None, :, None] * fw[None, None, None, None, :]
    xf = xf.transpose(0, 2, 1, 3, 4).reshape(B, -1, C * P * F)
    naive = np.asarray(xf @ proj_w)

    # fused path: one GEMM over raw pixels
    w_eff = spectral_patch_matrix(jnp.asarray(proj_w), jnp.asarray(fh), jnp.asarray(fw), P, C)
    fused = np.asarray(flatten_patches_cjk(jnp.asarray(x), P) @ w_eff)
    np.testing.assert_allclose(fused, naive, rtol=1e-3, atol=1e-4)


def test_log_magnitude_rfft2_matches_torch(rng):
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    expected = torch.log1p(torch.abs(torch.fft.rfft2(torch.from_numpy(x), dim=(-2, -1)))).numpy()
    np.testing.assert_allclose(
        np.asarray(log_magnitude_rfft2(jnp.asarray(x))), expected, rtol=1e-4, atol=1e-5
    )
