"""FFT-domain ops: FNet-style mixers and per-patch spectral embedding math.

TPU-first design note (SURVEY.md §7 "hard parts"): at patch size P<=8 the
per-patch 2D rFFT is a tiny fixed linear map, so instead of calling an FFT
library per patch (the reference calls cuFFT via ``torch.fft.rfft2`` at
spectre.py:136) we materialize the real-part DFT matrix once and fold it — at
run time — into the patch-projection weight. The whole SpectralPatchEmbed then
lowers to ONE large GEMM on the MXU (see ``spectral_patch_matrix``). The
straightforward ``patch_rfft2_real`` path is kept as the parity reference.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def rfft_real(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Real part of the 1D rFFT. Reference ``FFT`` module
    (modules/spectre.py:5-14). Output length is n//2+1 along ``axis``."""
    return jnp.fft.rfft(x, axis=axis).real


def fft2_real(x: jnp.ndarray) -> jnp.ndarray:
    """FNet token mixer: Re(FFT over embed dim then token dim), shape-preserving.

    The fft_bare configuration promised by the reference layer docstring
    (spectre.py:30-36); FNet (Lee-Thorp et al. 2021) applies
    ``real(fft(fft(x, dim=-1), dim=-2))``.
    """
    return jnp.fft.fft2(x, axes=(-2, -1)).real


@lru_cache(maxsize=None)
def _dft_cos_sin_np(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Cosine/sine DFT matrices: C[u,j]=cos(2pi uj/n), S[u,j]=sin(2pi uj/n)."""
    u = np.arange(n)
    ang = 2 * np.pi * np.outer(u, u) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def dft_matrices(n: int, dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    c, s = _dft_cos_sin_np(n)
    return jnp.asarray(c, dtype=dtype), jnp.asarray(s, dtype=dtype)


def fft2_real_matmul(x: jnp.ndarray) -> jnp.ndarray:
    """Re(fft2(x)) over the last two axes via dense DFT matmuls.

    TPU-native formulation of the FNet mixer: at model sizes (seq<=65,
    embed<=768) the dense DFT is a handful of MXU matmuls, which both avoids
    the XLA-TPU FFT path (unimplemented for some shapes on this backend) and
    fuses with neighbors. For real x:
        Re(F_a x F_b^T) = C_a x C_b^T - S_a x S_b^T.
    """
    n_tok, n_emb = x.shape[-2], x.shape[-1]
    c_t, s_t = dft_matrices(n_tok, x.dtype)
    c_e, s_e = dft_matrices(n_emb, x.dtype)
    cx = jnp.einsum("uj,...je,ve->...uv", c_t, x, c_e)
    sx = jnp.einsum("uj,...je,ve->...uv", s_t, x, s_e)
    return cx - sx


def log_magnitude_rfft2(x: jnp.ndarray) -> jnp.ndarray:
    """log1p(|rfft2(x)|) over the last two axes — the SpectreBranch frequency
    trunk input (reference spectre_branch.py:159)."""
    return jnp.log1p(jnp.abs(jnp.fft.rfft2(x, axes=(-2, -1))))


def extract_patches(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, C, H, W] -> [B, C, N, P, P] with the reference's unfold ordering.

    Matches ``x.unfold(2,P,P).unfold(3,P,P).contiguous().view(B,C,N,P,P)``
    (spectre.py:130-133): patch n = (i, j) row-major, containing
    x[:, :, i*P:(i+1)*P, j*P:(j+1)*P].
    """
    B, C, H, W = x.shape
    P = patch_size
    nH, nW = H // P, W // P
    x = x.reshape(B, C, nH, P, nW, P)
    x = x.transpose(0, 1, 2, 4, 3, 5)  # [B, C, nH, nW, P, P]
    return x.reshape(B, C, nH * nW, P, P)


def patch_rfft2_real(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Per-patch Re(rfft2(., norm="ortho")) — parity path for
    SpectralPatchEmbed (spectre.py:130-136). Returns [B, C, N, P, P//2+1]."""
    patches = extract_patches(x, patch_size)
    return jnp.fft.rfft2(patches, norm="ortho").real


@lru_cache(maxsize=None)
def _rfft2_real_matrix_np(p: int) -> np.ndarray:
    """Dense matrix D of the linear map patch[P,P] -> Re(rfft2(patch, ortho)).

    D has shape [P*(P//2+1), P*P]; row (u, v), column (j, k):
    cos(2*pi*(u*j + v*k)/P) / P  (ortho normalization = 1/sqrt(P*P)).
    """
    f = p // 2 + 1
    j = np.arange(p)
    u = np.arange(p)
    v = np.arange(f)
    # angle[u, v, j, k] = 2pi (u j / p + v k / p)
    ang = 2 * np.pi * (
        np.einsum("u,j->uj", u, j)[:, None, :, None]
        + np.einsum("v,k->vk", v, j)[None, :, None, :]
    ) / p
    d = np.cos(ang) / p  # ortho: 1/sqrt(p) per axis
    return d.reshape(p * f, p * p).astype(np.float32)


def rfft2_real_matrix(p: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_rfft2_real_matrix_np(p), dtype=dtype)


def spectral_patch_matrix(
    proj_w: jnp.ndarray,
    freq_weight_h: jnp.ndarray,
    freq_weight_w: jnp.ndarray,
    patch_size: int,
    in_channels: int,
) -> jnp.ndarray:
    """Fold (rfft2 -> freq reweight -> projection) into one [C*P*P, E] matrix.

    Given the SpectralPatchEmbed parameters (proj_w: [C*P*F, E] with input
    index order (c, u, v) matching the reference flatten at spectre.py:144-148,
    freq_weight_h: [P], freq_weight_w: [F]), returns W_eff such that

        embed(patch) = flatten_cjk(patches) @ W_eff  ==
        proj(freqw * Re(rfft2(patch, ortho)))

    This turns the whole spectral patch embed into a single GEMM — the
    TPU-native replacement for the reference's per-patch cuFFT call.
    Cost of the fold itself: O(C * P^2 * F * E) ~ trivial, recomputed per step
    so the freq weights stay learnable.
    """
    P, F, C = patch_size, patch_size // 2 + 1, in_channels
    E = proj_w.shape[-1]
    d = rfft2_real_matrix(P, proj_w.dtype)  # [P*F, P*P]
    fw = (freq_weight_h[:, None] * freq_weight_w[None, :]).reshape(P * F)
    w = proj_w.reshape(C, P * F, E) * fw[None, :, None]
    # per-channel: D^T @ w_c : [P*P, E]
    w_eff = jnp.einsum("fp,cfe->cpe", d, w)  # [C, P*P, E]
    return w_eff.reshape(C * P * P, E)


def flatten_patches_cjk(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, C, H, W] -> [B, N, C*P*P] with (c, j, k) inner ordering, matching
    the flatten the reference applies after FFT (spectre.py:143-144)."""
    patches = extract_patches(x, patch_size)  # [B, C, N, P, P]
    B, C, N, P, _ = patches.shape
    return patches.transpose(0, 2, 1, 3, 4).reshape(B, N, C * P * P)
