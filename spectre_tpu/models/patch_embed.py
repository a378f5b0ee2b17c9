"""Patch embedding modules.

TPU-first design: a Conv2d with kernel=stride=P (the reference PatchEmbedding,
patch_embeddings.py:11-16) is mathematically a patchify-reshape followed by a
dense projection — so both embedders here lower to ONE GEMM on the MXU over
[B*N, C*P*P] patches. For the spectral variant the per-patch rFFT2 and the
learnable frequency weights are folded into the projection matrix at run time
(ops.spectral_patch_matrix), eliminating the per-patch FFT entirely
(reference called cuFFT per patch at spectre.py:136).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from spectre_tpu.models.init import torch_bias_init, torch_kernel_init
from spectre_tpu.ops import flatten_patches_cjk, spectral_patch_matrix

Dtype = Any


class PatchEmbedding(nn.Module):
    """Conv-patchify embed + CLS + learned pos-embed + dropout
    (reference patch_embeddings.py:4-43). Input [B, C, H, W] (NCHW, matching
    the reference data layout); output [B, N+1, E]."""

    embed_dim: int
    patch_size: int
    num_patches: int
    dropout: float
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B = x.shape[0]
        patches = flatten_patches_cjk(x.astype(self.dtype), self.patch_size)  # [B, N, C*P*P]
        x = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(patches.shape[-1]),
                     name="patcher")(patches)  # == Conv2d(k=P, s=P)

        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.embed_dim), self.param_dtype)
        pos = self.param("position_embeddings", nn.initializers.normal(1.0),
                         (1, self.num_patches + 1, self.embed_dim), self.param_dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (B, 1, self.embed_dim)), x],
                            axis=1)
        x = x + pos.astype(self.dtype)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class SpectralPatchEmbed(nn.Module):
    """FFT-domain patch embed (reference SpectralPatchEmbed, spectre.py:106-156).

    Semantics: unfold P x P patches -> Re(rfft2(patch, ortho)) -> multiply
    learnable per-frequency weights freq_weight_h [P] / freq_weight_w [P//2+1]
    -> flatten (c, u, v) -> Dense(E) -> CLS + pos-embed + dropout.

    Execution: the DFT + freq-weights + Dense chain is folded into one
    effective [C*P*P, E] matrix per step, so the forward is a single GEMM on
    raw pixel patches (fused path verified against the naive path in
    tests/test_ops_fft.py::test_spectral_patch_matrix_fused_equals_naive).
    """

    embed_dim: int
    patch_size: int
    num_patches: int
    dropout: float
    in_channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B = x.shape[0]
        P = self.patch_size
        F = P // 2 + 1
        C = self.in_channels

        freq_h = self.param("freq_weight_h", nn.initializers.ones, (P,), self.param_dtype)
        freq_w = self.param("freq_weight_w", nn.initializers.ones, (F,), self.param_dtype)
        # proj params in spectral-domain layout [C*P*F, E] — identical state to
        # the reference nn.Linear (spectre.py:117), applied via the folded matrix
        proj_kernel = self.param("proj_kernel", torch_kernel_init,
                                 (C * P * F, self.embed_dim), self.param_dtype)
        proj_bias = self.param("proj_bias", torch_bias_init(C * P * F),
                               (self.embed_dim,), self.param_dtype)

        w_eff = spectral_patch_matrix(
            proj_kernel.astype(self.dtype),
            freq_h.astype(self.dtype),
            freq_w.astype(self.dtype),
            P, C,
        )  # [C*P*P, E]
        patches = flatten_patches_cjk(x.astype(self.dtype), P)  # [B, N, C*P*P]
        x = patches @ w_eff + proj_bias.astype(self.dtype)

        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.embed_dim), self.param_dtype)
        pos = self.param("position_embeddings", nn.initializers.normal(1.0),
                         (1, self.num_patches + 1, self.embed_dim), self.param_dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (B, 1, self.embed_dim)), x],
                            axis=1)
        x = x + pos.astype(self.dtype)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)
