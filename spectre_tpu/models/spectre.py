"""SpectreViT — the attention-free spectral ViT family.

Parity topology (the odd residual structure is intentional, SURVEY.md §7):

- SpectreEncoderLayer (reference spectre.py:29-73):
      x = norm1(mix(x)) + x          # post-norm on the mixer output only
      x = norm2(x + ff(x))           # ff = dropout(SpectreLinear) x2
  The reference resolves an ``activation`` arg but never applies it in
  forward (spectre.py:60-63) — the activation lives inside SpectreLinear's
  GELU; we keep that contract.
- SpectreEncoder (spectre.py:76-103): N layers, optional final norm, then a
  GLOBAL residual ``output + src`` across the whole stack.
- SpectreViT (spectre.py:159-202): SpectralPatchEmbed -> encoder -> CLS token
  -> SpectreLinear head; ``__call__(x, return_features=True)`` also returns
  the CLS features (for distillation).

Divergence from the reference (documented, intentional): torch ``_get_clones``
deep-copies the prototype layer, so all reference encoder layers start from
IDENTICAL weights; here each layer gets an independent init, the standard and
strictly better choice.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from spectre_tpu.models.layers import SpectreLinear
from spectre_tpu.models.mixers import AttentionMixer, make_mixer
from spectre_tpu.models.patch_embed import SpectralPatchEmbed

Dtype = Any


class SpectreEncoderLayer(nn.Module):
    seq_length: int
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    method: str = "permut_mix"
    mix_impl: str = "gather"
    mix_block: int = 0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        mixer = make_mixer(
            self.method,
            embed_dim=self.d_model,
            seq_length=self.seq_length,
            num_heads=self.nhead,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            mix_impl=self.mix_impl,
            mix_block=self.mix_block,
            use_pallas=self.use_pallas,
            name="mix_layer",
        )
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm2")

        if isinstance(mixer, AttentionMixer):
            mixed = mixer(x, deterministic=deterministic)
        else:
            mixed = mixer(x)
        x = norm1(mixed) + x

        ff = SpectreLinear(self.dim_feedforward, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           use_pallas=self.use_pallas, name="linear1")(x)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        ff = SpectreLinear(self.d_model, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           use_pallas=self.use_pallas, name="linear3")(ff)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        return norm2(x + ff)


class SpectreEncoder(nn.Module):
    num_layers: int
    seq_length: int
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    method: str = "permut_mix"
    mix_impl: str = "gather"
    mix_block: int = 0
    use_pallas: bool = False
    use_final_norm: bool = False  # reference SpectreViT passes norm=None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        output = src
        for i in range(self.num_layers):
            output = SpectreEncoderLayer(
                seq_length=self.seq_length,
                d_model=self.d_model,
                nhead=self.nhead,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                method=self.method,
                mix_impl=self.mix_impl,
                mix_block=self.mix_block,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(output, deterministic=deterministic)
        if self.use_final_norm:
            output = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  param_dtype=self.param_dtype, name="norm")(output)
        return output + src  # global residual (spectre.py:103)


class SpectreViT(nn.Module):
    img_size: int = 32
    patch_size: int = 4
    in_channels: int = 3
    num_classes: int = 10
    embed_dim: int = 768
    num_encoders: int = 12
    num_heads: int = 12
    hidden_dim: int = 3072
    dropout: float = 0.1
    method: str = "permut_mix"
    mix_impl: str = "gather"
    mix_block: int = 0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_features: bool = False,
                 deterministic: bool = True):
        num_patches = (self.img_size // self.patch_size) ** 2
        x = SpectralPatchEmbed(
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            num_patches=num_patches,
            dropout=self.dropout,
            in_channels=self.in_channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="embeddings_block",
        )(x, deterministic=deterministic)

        x = SpectreEncoder(
            num_layers=self.num_encoders,
            seq_length=num_patches + 1,
            d_model=self.embed_dim,
            nhead=self.num_heads,
            dim_feedforward=self.hidden_dim,
            dropout=self.dropout,
            method=self.method,
            mix_impl=self.mix_impl,
            mix_block=self.mix_block,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="encoder_blocks",
        )(x, deterministic=deterministic)

        cls_token = x[:, 0, :]
        logits = SpectreLinear(self.num_classes, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               use_pallas=self.use_pallas, name="mlp_head")(cls_token)
        logits = logits.astype(jnp.float32)
        if return_features:
            return logits, cls_token.astype(jnp.float32)
        return logits
