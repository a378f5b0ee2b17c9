"""Import weights from the reference PyTorch models into the flax models.

Migration surface for users of the reference (Biblbrox/ViT-Spectre-Experiments):
a ``model.state_dict()`` saved by the reference — ``SpectreViT``
(spectre.py:159-202), ``ViT`` (vit.py:7-51) or ``SpectreBranch``
(spectre_branch.py:176-225) — maps 1:1 onto the flax parameter/buffer trees
here, including the MHPermutMix ``perms``/``signs`` buffers, so a trained
reference checkpoint transfers exactly.

All functions take ``variables`` (the flax model's init output, used for
tree structure + shape checks) and ``sd``: a flat ``{torch key: numpy
array}`` mapping (call ``{k: v.numpy() for k, v in model.state_dict().items()}``
on the torch side — no torch dependency here).

Layout conventions handled:
- ``nn.Linear.weight`` [out, in]      -> Dense ``kernel`` [in, out] (transpose)
- ``nn.LayerNorm.weight/bias``        -> ``scale``/``bias``
- ``nn.Conv2d.weight`` [O, I, kH, kW] -> Conv ``kernel`` [kH, kW, I, O]
- conv patchify [E, C, P, P]          -> patchify-GEMM kernel [C*P*P, E]
  (flatten_patches_cjk uses the same (c, row, col) patch-pixel order)
- ``nn.MultiheadAttention.in_proj_weight`` [3E, E] -> per-head q/k/v kernels
  [E, H, Dh] (torch packs heads contiguously along the output dim)
- SpectreLinear ``local_head.{0,1}``  -> ``kernel/bias/ln_scale/ln_bias``
- MHPermutMix ``perms``/``signs``     -> the ``mix_tables`` buffer tuple

Numerical parity of the full transferred models against the actual reference
implementation is asserted in tests/test_reference_oracle.py.
"""

from __future__ import annotations

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def _dense(sd: dict, prefix: str) -> dict:
    return {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
            "bias": sd[f"{prefix}.bias"]}


def _layer_norm(sd: dict, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _spectre_linear(sd: dict, prefix: str) -> dict:
    """Reference SpectreLinear (layers.py:76-101): local_head = Sequential(
    Linear, LayerNorm, GELU) -> flax {kernel, bias, ln_scale, ln_bias}."""
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.local_head.0.weight"].T),
        "bias": sd[f"{prefix}.local_head.0.bias"],
        "ln_scale": sd[f"{prefix}.local_head.1.weight"],
        "ln_bias": sd[f"{prefix}.local_head.1.bias"],
    }


def _conv2d(sd: dict, prefix: str) -> dict:
    return {"kernel": np.ascontiguousarray(
                sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)),
            "bias": sd[f"{prefix}.bias"]}


def _patch_embedding(sd: dict, prefix: str) -> dict:
    """Reference PatchEmbedding (patch_embeddings.py:4-43): Conv2d(k=P, s=P)
    -> the patchify GEMM kernel [C*P*P, E]."""
    w = sd[f"{prefix}.patcher.0.weight"]  # [E, C, P, P]
    e = w.shape[0]
    return {
        "patcher": {"kernel": np.ascontiguousarray(w.reshape(e, -1).T),
                    "bias": sd[f"{prefix}.patcher.0.bias"]},
        "cls_token": sd[f"{prefix}.cls_token"],
        "position_embeddings": sd[f"{prefix}.position_embeddings"],
    }


def _mix_tables(sd: dict, prefix: str):
    """MHPermutMix buffers (layers.py:61-65): perms [H, d] int64 -> int32,
    signs [1, H, d] float32 — the exact ``mix_tables`` tuple layout."""
    return (sd[f"{prefix}.perms"].astype(np.int32),
            sd[f"{prefix}.signs"].astype(np.float32))


def _mhsa(sd: dict, prefix: str, num_heads: int) -> dict:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = sd[f"{prefix}.in_proj_weight"]  # [3E, E]
    b = sd[f"{prefix}.in_proj_bias"]    # [3E]
    e = w.shape[1]
    dh = e // num_heads
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * e:(i + 1) * e]  # [E_out, E_in]
        out[name] = {
            "kernel": np.ascontiguousarray(wi.T).reshape(e, num_heads, dh),
            "bias": b[i * e:(i + 1) * e].reshape(num_heads, dh),
        }
    wo = sd[f"{prefix}.out_proj.weight"]  # [E, E]
    out["out"] = {
        "kernel": np.ascontiguousarray(wo.T).reshape(num_heads, dh, e),
        "bias": sd[f"{prefix}.out_proj.bias"],
    }
    return out


def _check_and_cast(variables, new_vars):
    """Shape-check every transferred leaf against the init tree and cast to
    the init dtypes; raises on missing/mismatched entries."""
    ref = flatten_dict(variables)
    new = flatten_dict(new_vars)
    if set(ref) != set(new):
        missing = sorted("/".join(k) for k in set(ref) - set(new))
        extra = sorted("/".join(k) for k in set(new) - set(ref))
        raise ValueError(f"tree mismatch: missing={missing} extra={extra}")
    out = {}
    for k, v in new.items():
        r = ref[k]
        if isinstance(r, tuple):  # buffer tuples (mix_tables)
            assert isinstance(v, tuple) and len(v) == len(r)
            for a, b in zip(v, r):
                if tuple(a.shape) != tuple(b.shape):
                    raise ValueError(
                        f"{'/'.join(k)}: shape {a.shape} != {b.shape}")
            out[k] = tuple(np.asarray(a).astype(b.dtype)
                           for a, b in zip(v, r))
        else:
            v = np.asarray(v)
            if tuple(v.shape) != tuple(np.shape(r)):
                raise ValueError(f"{'/'.join(k)}: shape {v.shape} != {np.shape(r)}")
            out[k] = v.astype(np.asarray(r).dtype)
    return unflatten_dict(out)


def import_spectre_vit(variables, sd: dict, num_encoders: int):
    """Reference SpectreViT state_dict -> flax SpectreViT variables
    (method='permut_mix'). Match: spectre.py:159-202, layers.py:53-101."""
    params = {
        "embeddings_block": {
            "freq_weight_h": sd["embeddings_block.freq_weight_h"],
            "freq_weight_w": sd["embeddings_block.freq_weight_w"],
            "proj_kernel": np.ascontiguousarray(
                sd["embeddings_block.proj.weight"].T),
            "proj_bias": sd["embeddings_block.proj.bias"],
            "cls_token": sd["embeddings_block.cls_token"],
            "position_embeddings": sd["embeddings_block.position_embeddings"],
        },
        "encoder_blocks": {},
        "mlp_head": _spectre_linear(sd, "mlp_head.0"),
    }
    buffers = {"encoder_blocks": {}}
    for i in range(num_encoders):
        t = f"encoder_blocks.layers.{i}"
        params["encoder_blocks"][f"layer_{i}"] = {
            "mix_layer": {"linear": _spectre_linear(sd, f"{t}.mix_layer.linear")},
            "linear1": _spectre_linear(sd, f"{t}.linear1"),
            "linear3": _spectre_linear(sd, f"{t}.linear3"),
            "norm1": _layer_norm(sd, f"{t}.norm1"),
            "norm2": _layer_norm(sd, f"{t}.norm2"),
        }
        buffers["encoder_blocks"][f"layer_{i}"] = {
            "mix_layer": {"mix_tables": _mix_tables(sd, f"{t}.mix_layer")},
        }
    return _check_and_cast(variables, {"params": params, "buffers": buffers})


def import_vit(variables, sd: dict, num_encoders: int, num_heads: int):
    """Reference ViT state_dict -> flax ViT variables. Match: vit.py:7-51."""
    params = {
        "embeddings_block": _patch_embedding(sd, "embeddings_block"),
        "mlp_head": _dense(sd, "mlp_head.0"),
    }
    for i in range(num_encoders):
        t = f"encoder_blocks.layers.{i}"
        params[f"encoder_{i}"] = {
            "self_attn": {"mhsa": _mhsa(sd, f"{t}.self_attn", num_heads)},
            "linear1": _dense(sd, f"{t}.linear1"),
            "linear2": _dense(sd, f"{t}.linear2"),
            "norm1": _layer_norm(sd, f"{t}.norm1"),
            "norm2": _layer_norm(sd, f"{t}.norm2"),
        }
    return _check_and_cast(variables, {"params": params})


def import_spectre_branch(variables, sd: dict, num_encoders: int):
    """Reference SpectreBranch state_dict -> flax SpectreBranch variables
    (method='none' — the reference encoder layer's mix is commented out,
    spectre_branch.py:76-82; its dead ``mix_layer`` Linear weights are
    intentionally dropped). Match: spectre_branch.py:92-225."""
    enc = {
        "spectre_branch": {},
    }
    for i in range(num_encoders):
        t = f"encoder_blocks.layers.{i}"
        enc[f"layer_{i}"] = {
            "linear1": _dense(sd, f"{t}.linear1"),
            "linear2": _dense(sd, f"{t}.linear2"),
            "linear3": _dense(sd, f"{t}.linear3"),
            "norm1": _layer_norm(sd, f"{t}.norm1"),
            "norm2": _layer_norm(sd, f"{t}.norm2"),
        }
        enc["spectre_branch"][f"stage_{i}"] = _conv2d(
            sd, f"encoder_blocks.spectre_branch.net.{i}.0")
        enc["spectre_branch"][f"project_{i}"] = _conv2d(
            sd, f"encoder_blocks.spectre_branch.project.{i}.0")
        enc[f"spectre_project_{i}"] = _dense(sd, f"encoder_blocks.spectre_project.{i}")
    params = {
        "embeddings_block": _patch_embedding(sd, "embeddings_block"),
        "encoder_blocks": enc,
        "mlp_head": _dense(sd, "mlp_head.0"),
    }
    return _check_and_cast(variables, {"params": params})
