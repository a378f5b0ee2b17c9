"""SpectreBranch — dual-path model: token trunk + frequency-domain CNN branch
(reference ``spectre_branch.py:176-225``).

Structure: standard PatchEmbedding trunk; a parallel SpectreFeatExtractor CNN
pyramid over log1p(|rfft2(image)|) (spectre_branch.py:159) whose per-stage
features are projected to token space (Conv1x1 -> flatten -> adaptive-pool to
N tokens -> transpose, spectre_branch.py:140-152); each encoder layer's output
is concatenated with its stage's frequency features and fused back to
embed_dim (spectre_branch.py:105,112-114), with a global residual.

Divergences from the reference (documented):
- fusion width follows ``embed_dim`` instead of the reference's hard-coded 768
  (spectre_branch.py:105), so any config works;
- the encoder layer keeps the configured mixer active — the reference
  commented the mix out, degenerating to FF-only (spectre_branch.py:76-82);
  ``method=None``/"none" reproduces the degenerate behavior exactly;
- |rfft2| magnitude is computed with dense DFT matmuls on the MXU
  (32x32 images -> trivial FLOPs) rather than a library FFT call.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from spectre_tpu.models.init import torch_bias_init, torch_kernel_init
from spectre_tpu.models.mixers import AttentionMixer, make_mixer
from spectre_tpu.models.patch_embed import PatchEmbedding
from spectre_tpu.ops import adaptive_avg_pool1d, dft_matrices

Dtype = Any


def rfft2_log_magnitude_matmul(x: jnp.ndarray) -> jnp.ndarray:
    """log1p(|rfft2(x)|) over the last two axes via DFT matmuls.

    For real x: X = F_h x F_w^T restricted to the first W//2+1 cols;
    Re = C_h x C_w^T - S_h x S_w^T, Im = -(C_h x S_w^T + S_h x C_w^T).
    """
    h, w = x.shape[-2], x.shape[-1]
    ch, sh = dft_matrices(h, x.dtype)
    cw, sw = dft_matrices(w, x.dtype)
    f = w // 2 + 1
    cw, sw = cw[:f], sw[:f]
    cx = jnp.einsum("uj,...jk->...uk", ch, x)
    sx = jnp.einsum("uj,...jk->...uk", sh, x)
    re = jnp.einsum("...uk,vk->...uv", cx, cw) - jnp.einsum("...uk,vk->...uv", sx, sw)
    im = -(jnp.einsum("...uk,vk->...uv", cx, sw) + jnp.einsum("...uk,vk->...uv", sx, cw))
    return jnp.log1p(jnp.sqrt(re * re + im * im))


class SpectreBranchEncoderLayer(nn.Module):
    """Encoder layer with a deeper FF block than SpectreEncoderLayer:
    linear1 -> linear2 -> linear3 plain Denses (spectre_branch.py:57-88)."""

    seq_length: int
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    method: str | None = "permut_mix"
    mix_impl: str = "gather"
    mix_block: int = 0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm2")
        if self.method in (None, "none"):
            mixed = x  # reference degenerate behavior (mix commented out)
        else:
            mixer = make_mixer(self.method, embed_dim=self.d_model,
                               seq_length=self.seq_length, num_heads=self.nhead,
                               dropout=self.dropout, dtype=self.dtype,
                               mix_impl=self.mix_impl, mix_block=self.mix_block, use_pallas=self.use_pallas,
                               param_dtype=self.param_dtype, name="mix_layer")
            mixed = (mixer(x, deterministic=deterministic)
                     if isinstance(mixer, AttentionMixer) else mixer(x))
        x = norm1(mixed) + x

        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(self.d_model), name="linear1")(x)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(self.dim_feedforward),
                     name="linear2")(h)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(self.dim_feedforward),
                     name="linear3")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return norm2(x + h)


class SpectreFeatExtractor(nn.Module):
    """CNN pyramid over the image's log-magnitude spectrum
    (spectre_branch.py:122-173): per stage Conv3x3 (channels x3, VALID) feeding
    a Conv1x1 -> flatten -> adaptive-pool-to-N-tokens -> [B, N, E] projection."""

    in_channels: int
    embed_dim: int
    num_tokens: int
    num_stages: int
    reduction: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # x: [B, C, H, W] image -> frequency trunk input
        spec = rfft2_log_magnitude_matmul(x.astype(self.dtype))
        if self.reduction > 1:
            spec = spec[..., : spec.shape[-2] // self.reduction,
                        : spec.shape[-1] // self.reduction]
        # NCHW -> NHWC for flax convs
        h = jnp.transpose(spec, (0, 2, 3, 1))
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype,
                       kernel_init=torch_kernel_init)

        feats = []
        channels = self.in_channels
        for stage in range(self.num_stages):
            prev = channels
            channels *= 3
            h = conv(channels, (3, 3), padding="VALID",
                     bias_init=torch_bias_init(prev * 9),
                     name=f"stage_{stage}")(h)
            p = conv(self.embed_dim, (1, 1),
                     bias_init=torch_bias_init(channels),
                     name=f"project_{stage}")(h)
            b = p.shape[0]
            p = jnp.transpose(p, (0, 3, 1, 2)).reshape(b, self.embed_dim, -1)
            p = adaptive_avg_pool1d(p, self.num_tokens)  # [B, E, N]
            feats.append(jnp.transpose(p, (0, 2, 1)))  # [B, N, E]
        return h, feats


class SpectreBranchEncoder(nn.Module):
    num_layers: int
    num_patches: int  # token count incl. CLS (reference passes num_patches+1)
    seq_length: int
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    in_channels: int = 3
    method: str | None = "permut_mix"
    mix_impl: str = "gather"
    mix_block: int = 0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src: jnp.ndarray, img: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        _, feats = SpectreFeatExtractor(
            in_channels=self.in_channels, embed_dim=self.d_model,
            num_tokens=self.num_patches, num_stages=self.num_layers,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="spectre_branch")(img)

        output = src
        for i in range(self.num_layers):
            y = SpectreBranchEncoderLayer(
                seq_length=self.seq_length, d_model=self.d_model,
                nhead=self.nhead, dim_feedforward=self.dim_feedforward,
                dropout=self.dropout, method=self.method,
                mix_impl=self.mix_impl, mix_block=self.mix_block, use_pallas=self.use_pallas,
                dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"layer_{i}",
            )(output, deterministic=deterministic)
            fused = jnp.concatenate([y, feats[i]], axis=-1)
            output = nn.Dense(self.d_model, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              kernel_init=torch_kernel_init,
                              bias_init=torch_bias_init(2 * self.d_model),
                              name=f"spectre_project_{i}")(fused)
        return output + src


class SpectreBranch(nn.Module):
    img_size: int = 32
    patch_size: int = 4
    in_channels: int = 3
    num_classes: int = 10
    embed_dim: int = 768
    num_encoders: int = 12
    num_heads: int = 12
    hidden_dim: int = 3072
    dropout: float = 0.1
    method: str | None = "permut_mix"
    mix_impl: str = "gather"
    mix_block: int = 0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_features: bool = False,
                 deterministic: bool = True):
        img = x
        num_patches = (self.img_size // self.patch_size) ** 2
        x = PatchEmbedding(
            embed_dim=self.embed_dim, patch_size=self.patch_size,
            num_patches=num_patches, dropout=self.dropout,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="embeddings_block")(x, deterministic=deterministic)

        x = SpectreBranchEncoder(
            num_layers=self.num_encoders, num_patches=num_patches + 1,
            seq_length=num_patches + 1, d_model=self.embed_dim,
            nhead=self.num_heads, dim_feedforward=self.hidden_dim,
            dropout=self.dropout, in_channels=self.in_channels,
            method=self.method, mix_impl=self.mix_impl, mix_block=self.mix_block,
            use_pallas=self.use_pallas,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="encoder_blocks")(x, img, deterministic=deterministic)

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
