"""Pluggable token mixers — the six configurations the reference promised.

The reference encoder docstring (spectre.py:30-36, spectre_branch.py:36-42)
advertises selectable mixing methods but hard-wires MHPermutMix
(spectre.py:50) and ignores the drivers' ``method=`` argument
(vit_spectre_cifar100.py:62,123). Here the mixer is genuinely pluggable
(SURVEY.md §2 directive). Contract: [B, N, E] -> [B, N, E].

- ``permut_mix``  MHPermutMix sign+permutation mixing (the reference default)
- ``fft_bare``    FNet: Re(FFT2 over token+embed), as MXU DFT matmuls
- ``fft_mh``      multi-head FFT: per-head Dense -> Re(FFT2) -> concat -> proj
                  (the reference's SpectreMix, spectre_branch.py:9-32, with the
                  FFT active as the docstring intends)
- ``dwt_embed``   Haar DWT along the embedding axis
- ``dwt_token``   Haar DWT along the token axis
- ``attention``   standard multi-head self-attention (ViT parity)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

import jax

from spectre_tpu.models.init import torch_bias_init, torch_kernel_init
from spectre_tpu.models.layers import MHPermutMix
from spectre_tpu.ops import fft2_real_matmul, haar_dwt_mix
from spectre_tpu.ops.pallas import flash_attention

Dtype = Any

MIXERS = ("permut_mix", "fft_bare", "fft_mh", "dwt_embed", "dwt_token", "attention")


class FNetMixer(nn.Module):
    """fft_bare: parameter-free FNet mixing, Re(DFT_token . x . DFT_embed^T)."""

    dtype: Dtype = jnp.float32

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return fft2_real_matmul(x.astype(self.dtype))


class MHFFTMixer(nn.Module):
    """fft_mh: per-head Dense(E -> E/shrink) -> Re(FFT2) -> concat -> proj, with
    residual (reference SpectreMix, spectre_branch.py:9-32; shrink=4)."""

    embed_dim: int
    num_heads: int
    shrink: int = 4
    use_fft: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        head_dim = self.embed_dim // self.shrink
        heads = []
        for h in range(self.num_heads):
            e = nn.Dense(head_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                         kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(x.shape[-1]),
                         name=f"head_{h}")(x)
            if self.use_fft:
                e = fft2_real_matmul(e)
            heads.append(e)
        full = jnp.concatenate(heads, axis=-1)
        proj = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(full.shape[-1]),
                        name="proj_head")(full)
        return proj + residual


class DWTMixer(nn.Module):
    """dwt_embed / dwt_token: shape-preserving Haar subband concat along the
    chosen axis (the docstring contract spectre.py:33-34)."""

    axis: int  # -1 = embed, -2 = token

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return haar_dwt_mix(x, axis=self.axis)


class AttentionMixer(nn.Module):
    """Standard MHSA over [B, N, E] (batch-first — the reference ViT fed
    batch-first tensors to a seq-first torch TransformerEncoder, vit.py:30-38;
    we keep the intended semantics, not the transposed ones)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attention_fn = nn.dot_product_attention
        if self.use_pallas and (deterministic or self.dropout == 0.0):
            # fused VMEM-resident attention kernel (ops/pallas/attention.py);
            # flax hands q/k/v as [B, N, H, D]
            def attention_fn(query, key, value, **kwargs):  # noqa: F811
                out = flash_attention(
                    jnp.transpose(query, (0, 2, 1, 3)),
                    jnp.transpose(key, (0, 2, 1, 3)),
                    jnp.transpose(value, (0, 2, 1, 3)),
                )
                return jnp.transpose(out, (0, 2, 1, 3))

        # torch nn.MultiheadAttention init (_reset_parameters): in_proj
        # xavier_uniform over the packed [3E, E] matrix -> bound
        # sqrt(6/(E+3E)) = sqrt(1.5/E); out_proj is a plain Linear
        # (kaiming_uniform a=sqrt(5) -> bound 1/sqrt(E)); all biases zero.
        e = self.embed_dim

        def qkv_init(key, shape, dtype):
            bound = (1.5 / e) ** 0.5
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        def out_init(key, shape, dtype):
            bound = e ** -0.5
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dim,
            out_features=self.embed_dim,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_fn=attention_fn,
            kernel_init=qkv_init,
            out_kernel_init=out_init,
            name="mhsa",
        )(x, x)


def make_mixer(
    method: str,
    *,
    embed_dim: int,
    seq_length: int,
    num_heads: int,
    dropout: float = 0.0,
    dtype=jnp.float32,
    param_dtype=jnp.float32,
    mix_impl: str = "gather",
    mix_block: int = 0,
    use_pallas: bool = False,
    name: str = "mix_layer",
) -> nn.Module:
    """Mixer factory keyed by the config ``method`` knob."""
    if method == "permut_mix":
        return MHPermutMix(embed_dim=embed_dim, token_dim=seq_length,
                           num_heads=num_heads, out_channels=embed_dim,
                           impl=mix_impl, mix_block=mix_block,
                           use_pallas=use_pallas,
                           dtype=dtype, param_dtype=param_dtype, name=name)
    if method == "fft_bare":
        return FNetMixer(dtype=dtype, name=name)
    if method == "fft_mh":
        return MHFFTMixer(embed_dim=embed_dim, num_heads=num_heads,
                          dtype=dtype, param_dtype=param_dtype, name=name)
    if method == "dwt_embed":
        return DWTMixer(axis=-1, name=name)
    if method == "dwt_token":
        return DWTMixer(axis=-2, name=name)
    if method == "attention":
        return AttentionMixer(embed_dim=embed_dim, num_heads=num_heads,
                              dropout=dropout, dtype=dtype, use_pallas=use_pallas,
                              param_dtype=param_dtype, name=name)
    raise ValueError(f"unknown mixer method {method!r}; expected one of {MIXERS}")
