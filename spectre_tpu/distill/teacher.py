"""DINO-family ViT teacher for distillation.

The reference loads DINOv3-S/16 through torch.hub from a git submodule that is
EMPTY in the snapshot (train.py:66-74; SURVEY.md §0), freezes it, and wraps it
in ``DinoClassifier`` whose forward takes
``backbone.forward_features(x)['x_norm_clstoken']`` into a linear decoder
(distillation.py:5-22). This module provides the TPU-native equivalent:

- ``DinoVisionTransformer``: flax ViT-S/16-style backbone with the DINO
  architectural details that matter for weight import (CLS + register tokens,
  pre-norm blocks, qkv bias, LayerScale, exact-GELU MLP, final LayerNorm) and
  a ``forward_features`` -> dict contract matching the reference's usage.
- ``import_torch_state_dict``: maps a torch DINOv2/v3 ``state_dict`` (read
  with numpy from a .pt/.npz dump) onto the flax param tree, so real weights
  drop in when present on disk.
- ``load_teacher``: weights from the ``teacher_checkpoint`` config key or
  $SPECTRE_TEACHER_WEIGHTS, otherwise a seeded random teacher (the
  distillation *machinery* — dual views, KD loss, frozen-teacher step — is
  exercised and tested either way).
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class _Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


def rope_periods_from_base(head_dim: int, base: float = 100.0,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Default geometric rotation periods, [D/4]: period_i = base^(2i/(D/2)).

    The real ``dinov3_*`` checkpoints ship these as the ``rope_embed.periods``
    buffer (the dinov3 RopePositionEmbedding supports base- OR min/max-period
    spacing, so the buffer is authoritative); this is the base-spaced default
    that matches ``base=100``. ``freqs = 1 / periods``.
    """
    dh = head_dim // 2
    return base ** (jnp.arange(dh // 2, dtype=dtype) * 2.0 / dh)


def rope_2d_angles(n_side: int, head_dim: int, base: float = 100.0,
                   dtype=jnp.float32, periods=None):
    """Axial 2D RoPE tables for an n_side x n_side patch grid.

    DINOv3 drops the learned absolute position embedding in favor of rotary
    embeddings over normalized patch coordinates. Convention implemented
    here (documented; parity-locked by the torch oracle in
    tests/test_distill_rope.py): patch-center coordinates normalized to
    [-1, 1] per axis; the head dim D splits into an x-half and a y-half;
    within each half, consecutive pairs (2i, 2i+1) rotate by
    ``coord / periods[i]`` (default periods ``base**(2i/(D/2))``, i.e.
    angle = coord * base**(-2i/(D/2))). Pass ``periods`` ([D/4]) to use a
    checkpoint's own ``rope_embed.periods`` buffer. Returns (cos, sin),
    each [N, D].
    """
    coords = (jnp.arange(n_side, dtype=dtype) + 0.5) / n_side * 2.0 - 1.0
    yy, xx = jnp.meshgrid(coords, coords, indexing="ij")
    pos = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)  # [N, 2]
    if periods is None:
        periods = rope_periods_from_base(head_dim, base, dtype)
    freqs = 1.0 / jnp.asarray(periods, dtype=dtype)  # [D/4]
    ang = pos[:, :, None] * freqs[None, None, :]  # [N, 2, D/4]
    ang = jnp.repeat(ang, 2, axis=-1)  # pair duplication -> [N, 2, D/2]
    ang = ang.reshape(ang.shape[0], head_dim)  # x-half then y-half
    return jnp.cos(ang), jnp.sin(ang)


def _rotate_pairs(t: jnp.ndarray) -> jnp.ndarray:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...) on the last axis."""
    t2 = t.reshape(*t.shape[:-1], t.shape[-1] // 2, 2)
    rot = jnp.stack([-t2[..., 1], t2[..., 0]], axis=-1)
    return rot.reshape(t.shape)


def apply_rope(t: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """t: [B, N, H, D]; cos/sin: [N, D]."""
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return t * c + _rotate_pairs(t) * s


class _RopeAttention(nn.Module):
    """MHSA with axial 2D RoPE on q/k of the PATCH tokens only (CLS and
    register/storage tokens are position-free, as in DINOv3). Param tree
    matches flax MultiHeadDotProductAttention (query/key/value/out with
    [E, H, Dh]-shaped kernels) so the torch qkv import map is shared."""

    dim: int
    num_heads: int
    num_prefix: int  # tokens that do NOT get rotated (CLS + registers)
    rope_base: float = 100.0
    # checkpoint-authoritative rotation periods (dinov3 rope_embed.periods);
    # None -> base-spaced default. Tuple: static module config, hashable.
    rope_periods: tuple | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, E = x.shape
        H = self.num_heads
        dh = E // H
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (H, dh), axis=-1, dtype=self.dtype, name=name)
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)

        n_patch = N - self.num_prefix
        n_side = int(round(n_patch ** 0.5))
        periods = (jnp.asarray(self.rope_periods, jnp.float32)
                   if self.rope_periods is not None else None)
        cos, sin = rope_2d_angles(n_side, dh, self.rope_base, jnp.float32,
                                  periods=periods)
        cos = cos.astype(q.dtype)
        sin = sin.astype(q.dtype)

        def rot(t):
            prefix, patches = t[:, :self.num_prefix], t[:, self.num_prefix:]
            return jnp.concatenate([prefix, apply_rope(patches, cos, sin)], axis=1)

        q, k = rot(q), rot(k)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (dh ** 0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return nn.DenseGeneral(E, axis=(-2, -1), dtype=self.dtype,
                               name="out")(out)


class _Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale_init: float = 1e-5
    use_rope: bool = False
    num_prefix: int = 0
    rope_periods: tuple | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.use_rope:
            h = _RopeAttention(dim=self.dim, num_heads=self.num_heads,
                               num_prefix=self.num_prefix, dtype=self.dtype,
                               rope_periods=self.rope_periods,
                               name="attn")(h)
        else:
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.dim,
                out_features=self.dim, dtype=self.dtype, name="attn")(h, h)
        ls1 = self.param("ls1_gamma", nn.initializers.constant(self.layerscale_init),
                         (self.dim,))
        x = x + h * ls1
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = _Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                 name="mlp")(h)
        ls2 = self.param("ls2_gamma", nn.initializers.constant(self.layerscale_init),
                         (self.dim,))
        return x + h * ls2


class DinoVisionTransformer(nn.Module):
    """ViT-S/16 teacher backbone (DINO family layout).

    ``variant``:
    - "v2": DINOv2-style — learned absolute pos-embed added to CLS+patches.
    - "v3": DINOv3-style — NO absolute pos-embed; axial 2D RoPE rotates q/k
      of the patch tokens inside every attention block (CLS + register/
      storage tokens stay position-free). This matches the reference's
      actual teacher (train.py:66-74 loads dinov3_vits16); the RoPE
      convention is parity-locked against a torch oracle in
      tests/test_distill_rope.py.
    """

    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_registers: int = 4
    variant: str = "v3"
    # rotation periods from a real checkpoint's rope_embed.periods buffer
    # (None -> base-100 geometric default, rope_periods_from_base)
    rope_periods: tuple | None = None
    dtype: Dtype = jnp.float32

    def forward_features(self, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        """Reference contract: backbone.forward_features(x)['x_norm_clstoken']
        (distillation.py:14-15). Delegates to __call__."""
        return self(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        B = x.shape[0]
        P, E = self.patch_size, self.embed_dim
        n = (self.img_size // P) ** 2
        # patchify as one GEMM (Conv k=P s=P == reshape+Dense; see
        # models/patch_embed.py for the derivation)
        xp = x.reshape(B, self.in_channels, self.img_size // P, P,
                       self.img_size // P, P)
        xp = xp.transpose(0, 2, 4, 1, 3, 5).reshape(B, n, self.in_channels * P * P)
        tokens = nn.Dense(E, dtype=self.dtype, name="patch_embed")(xp)

        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, E))
        regs = self.param("register_tokens", nn.initializers.normal(0.02),
                          (1, self.num_registers, E))
        if self.variant == "v2":
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, n + 1, E))
            cls_tok = jnp.broadcast_to(cls, (B, 1, E)) + pos[:, :1]
            tokens = tokens + pos[:, 1:]
        else:
            cls_tok = jnp.broadcast_to(cls, (B, 1, E))

        tokens = jnp.concatenate([
            cls_tok,
            jnp.broadcast_to(regs, (B, self.num_registers, E)),
            tokens,
        ], axis=1)

        use_rope = self.variant == "v3"
        for i in range(self.depth):
            tokens = _Block(dim=E, num_heads=self.num_heads, dtype=self.dtype,
                            use_rope=use_rope,
                            num_prefix=1 + self.num_registers,
                            rope_periods=self.rope_periods,
                            name=f"block_{i}")(tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
        return {
            "x_norm_clstoken": tokens[:, 0],
            "x_norm_regtokens": tokens[:, 1 : 1 + self.num_registers],
            "x_norm_patchtokens": tokens[:, 1 + self.num_registers :],
        }


class DinoClassifier(nn.Module):
    """Frozen-backbone linear classifier (reference DinoClassifier,
    distillation.py:5-22): decoder(backbone.forward_features['x_norm_clstoken'])."""

    backbone: DinoVisionTransformer
    num_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_features: bool = False):
        feats = self.backbone(x)["x_norm_clstoken"]
        logits = nn.Dense(self.num_classes, name="decoder")(feats)
        if return_features:
            return logits, feats
        return logits


def _torch_key_map(flax_params: dict, sd: dict[str, np.ndarray]) -> dict:
    """Map DINOv2/v3-style torch state_dict tensors onto the flax tree.

    torch Linear weight [out, in] -> flax kernel [in, out]; the fused torch
    qkv projection is split into flax's separate q/k/v DenseGeneral params.
    Unmatched flax leaves keep their init values; unused torch keys are
    reported by the caller.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(flax_params, sep="/")
    used = set()

    def put(fk, arr):
        if fk in flat and flat[fk].shape == arr.shape:
            flat[fk] = jnp.asarray(arr)
            return True
        return False

    E = None
    for k in sd:
        if k.endswith("cls_token"):
            E = sd[k].shape[-1]
    heads = None
    for fk in flat:
        if fk.endswith("attn/query/kernel"):
            heads = flat[fk].shape[1]
            break

    for tk, arr in sd.items():
        arr = np.asarray(arr)
        fk = None
        if tk == "cls_token":
            fk = "cls_token"; arr = arr.reshape(1, 1, -1)
        elif tk in ("register_tokens", "reg_tokens", "storage_tokens"):
            fk = "register_tokens"  # dinov3 names them storage_tokens
        elif tk == "pos_embed":
            fk = "pos_embed"
        elif tk == "patch_embed.proj.weight":  # conv [E, C, P, P] -> dense [C*P*P, E]
            fk = "patch_embed/kernel"; arr = arr.reshape(arr.shape[0], -1).T
        elif tk == "patch_embed.proj.bias":
            fk = "patch_embed/bias"
        elif tk == "norm.weight":
            fk = "norm/scale"
        elif tk == "norm.bias":
            fk = "norm/bias"
        elif ".blocks." in tk or tk.startswith("blocks."):
            parts = tk.split(".")
            i = parts[parts.index("blocks") + 1]
            rest = ".".join(parts[parts.index("blocks") + 2:])
            base = f"block_{i}"
            simple = {
                "norm1.weight": f"{base}/norm1/scale", "norm1.bias": f"{base}/norm1/bias",
                "norm2.weight": f"{base}/norm2/scale", "norm2.bias": f"{base}/norm2/bias",
                "mlp.fc1.weight": f"{base}/mlp/fc1/kernel", "mlp.fc1.bias": f"{base}/mlp/fc1/bias",
                "mlp.fc2.weight": f"{base}/mlp/fc2/kernel", "mlp.fc2.bias": f"{base}/mlp/fc2/bias",
                "ls1.gamma": f"{base}/ls1_gamma", "ls2.gamma": f"{base}/ls2_gamma",
                "attn.proj.weight": f"{base}/attn/out/kernel",
                "attn.proj.bias": f"{base}/attn/out/bias",
            }
            if rest in simple:
                fk = simple[rest]
                if rest == "attn.proj.weight" and heads:
                    # [E_out, E_in] -> flax out kernel [H, Dh, E_out]:
                    # transpose FIRST so the input dim splits into heads
                    # (kernel[h, dh, e] must equal W[e, h*Dh+dh]; the shape
                    # check alone cannot catch a transposed square matrix —
                    # value-level test in tests/test_distill_rope.py)
                    e_out = arr.shape[0]
                    arr = np.ascontiguousarray(arr.T).reshape(heads, -1, e_out)
                elif rest.endswith(".weight") and "norm" not in rest and "ls" not in rest:
                    arr = arr.T
            elif rest == "attn.qkv.weight" and E and heads:
                w = arr.reshape(3, E, E)  # [qkv, out, in] torch layout
                hd = E // heads
                for name, mat in zip(("query", "key", "value"), w):
                    put(f"{base}/attn/{name}/kernel",
                        mat.T.reshape(E, heads, hd))
                used.add(tk)
                continue
            elif rest == "attn.qkv.bias" and E and heads:
                bqkv = arr.reshape(3, E)
                hd = E // heads
                for name, vec in zip(("query", "key", "value"), bqkv):
                    put(f"{base}/attn/{name}/bias", vec.reshape(heads, hd))
                used.add(tk)
                continue
        if fk is not None and put(fk, arr):
            used.add(tk)

    params = flax.traverse_util.unflatten_dict(flat, sep="/")
    return params, used


def import_torch_state_dict(model: DinoVisionTransformer, params, sd: dict):
    """Load torch DINO weights into ``params``; returns (params, unused_keys).

    Two real-checkpoint keys are consumed WITHOUT landing in params:

    - ``mask_token``: the masked-image-modeling token; inference-time
      ``forward_features`` never reads it, so it is deliberately dropped.
    - ``rope_embed.periods``: the checkpoint-authoritative RoPE rotation
      periods (dinov3's RopePositionEmbedding supports base- or
      min/max-period spacing, so the buffer — not a base constant — defines
      the frequencies). The model computes its tables statically, so this
      importer VALIDATES the buffer against the model's effective periods
      and raises with the fix (rebuild with ``rope_periods=tuple(...)`` —
      load_teacher does this automatically) on mismatch, rather than
      silently running a teacher with wrong rotary frequencies.
    """
    new_params, used = _torch_key_map(params, sd)
    if "mask_token" in sd:
        used.add("mask_token")
    if "rope_embed.periods" in sd:
        arr = np.asarray(sd["rope_embed.periods"], np.float32).reshape(-1)
        dh = model.embed_dim // model.num_heads
        eff = (np.asarray(model.rope_periods, np.float32)
               if model.rope_periods is not None
               else np.asarray(rope_periods_from_base(dh), np.float32))
        if arr.shape != eff.shape or not np.allclose(arr, eff, rtol=1e-5):
            raise ValueError(
                "checkpoint rope_embed.periods differ from the model's "
                f"(ckpt {arr.shape}, model {eff.shape}); rebuild the "
                "backbone with rope_periods=tuple(ckpt_periods) — "
                "load_teacher does this automatically from the npz")
        used.add("rope_embed.periods")
    unused = sorted(set(sd) - used)
    return new_params, unused


def load_teacher(num_classes: int, img_size: int = 224, seed: int = 0,
                 variant: str = "v3", weights_path: str | None = None,
                 dtype: Dtype = jnp.float32):
    """Build (classifier_model, variables). Real weights load from
    ``weights_path`` (the ``teacher_checkpoint`` config key) or
    $SPECTRE_TEACHER_WEIGHTS (a numpy .npz dump of the torch state_dict);
    otherwise seeded random init (hermetic fallback — this image has no
    network egress to fetch DINOv3 checkpoints). ``variant='v3'`` (default,
    matching the reference's dinov3_vits16 teacher) uses RoPE attention and
    no absolute pos-embed; 'v2' keeps the learned pos-embed layout.

    ``dtype`` is the COMPUTE dtype (params stay f32): the teacher is frozen
    and inference-only, so the distill loop runs it in the config's
    compute_dtype (bf16 by default — softmax statistics stay f32 inside the
    attention block); the f32 default here keeps the torch-oracle parity
    tests exact."""
    path = weights_path or os.environ.get("SPECTRE_TEACHER_WEIGHTS")
    sd = None
    rope_periods = None
    if path and os.path.exists(path):
        sd = dict(np.load(path))
        if "rope_embed.periods" in sd:
            # the checkpoint's periods buffer is authoritative (base- OR
            # min/max-spaced); build the backbone around it
            rope_periods = tuple(
                np.asarray(sd["rope_embed.periods"], np.float32)
                .reshape(-1).tolist())

    backbone = DinoVisionTransformer(img_size=img_size, variant=variant,
                                     rope_periods=rope_periods, dtype=dtype)
    clf = DinoClassifier(backbone=backbone, num_classes=num_classes)
    x = jnp.zeros((1, 3, img_size, img_size))
    variables = clf.init(jax.random.key(seed), x)

    if sd is not None:
        bb_params = variables["params"]["backbone"]
        new_bb, unused = import_torch_state_dict(backbone, bb_params, sd)
        variables = {"params": {**variables["params"], "backbone": new_bb}}
        if unused:
            print(f"teacher import: {len(unused)} unused torch keys (e.g. {unused[:3]})")
    return clf, variables
