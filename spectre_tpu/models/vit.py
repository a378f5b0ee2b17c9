"""Baseline attention ViT (reference ``ViT``, vit.py:7-51).

Reference semantics: PatchEmbedding -> torch ``nn.TransformerEncoder`` stack
-> Linear CLS head. The torch encoder layer is post-norm
(norm_first=False default):

    x = norm1(x + dropout(self_attn(x)))
    x = norm2(x + dropout(linear2(dropout(act(linear1(x))))))

Two reference defects fixed, not ported (SURVEY.md §7 "known bugs"):
- the reference feeds batch-first [B, N, E] tensors into a seq-first
  (batch_first=False default) torch encoder, silently attending across the
  batch; here attention is over tokens, the intended ViT semantics.
- ``nn.Linear(embed_dim, num_classes, 5)`` passed a stray ``5`` into the bias
  arg (vit.py:40) — truthy, so bias=True; here bias is simply True.
The ``method`` kwarg the reference accepted-but-ignored (vit.py:20) is not
part of this module; mixer selection lives in SpectreViT.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from spectre_tpu.models.init import torch_bias_init, torch_kernel_init
from spectre_tpu.models.mixers import AttentionMixer
from spectre_tpu.models.patch_embed import PatchEmbedding
from spectre_tpu.ops import gelu_exact

Dtype = Any


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer with torch-default topology."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn = AttentionMixer(embed_dim=self.d_model, num_heads=self.nhead,
                              dropout=self.dropout, dtype=self.dtype,
                              use_pallas=self.use_pallas,
                              param_dtype=self.param_dtype, name="self_attn")(
            x, deterministic=deterministic)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm1")(x + attn)

        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(self.d_model), name="linear1")(x)
        h = gelu_exact(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(self.dim_feedforward),
                     name="linear2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="norm2")(x + h)


class ViT(nn.Module):
    img_size: int = 32
    patch_size: int = 4
    in_channels: int = 3
    num_classes: int = 10
    embed_dim: int = 768
    num_encoders: int = 12
    num_heads: int = 12
    hidden_dim: int = 3072
    dropout: float = 0.1
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_features: bool = False,
                 deterministic: bool = True):
        num_patches = (self.img_size // self.patch_size) ** 2
        x = PatchEmbedding(
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            num_patches=num_patches,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="embeddings_block",
        )(x, deterministic=deterministic)

        for i in range(self.num_encoders):
            x = TransformerEncoderLayer(
                d_model=self.embed_dim,
                nhead=self.num_heads,
                dim_feedforward=self.hidden_dim,
                dropout=self.dropout,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"encoder_{i}",
            )(x, deterministic=deterministic)

        cls_token = x[:, 0, :]
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          kernel_init=torch_kernel_init,
                          bias_init=torch_bias_init(self.embed_dim),
                          name="mlp_head")(cls_token)
        logits = logits.astype(jnp.float32)
        if return_features:
            return logits, cls_token.astype(jnp.float32)
        return logits
