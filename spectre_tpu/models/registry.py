"""Model registry: build any model in the zoo from a parsed config.

Replaces the reference's ad-hoc per-driver construction (train.py:48-59,
vit_spectre_cifar100.py:111-123) with one factory keyed on ``config.model``.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp

from spectre_tpu.models.spectre import SpectreViT
from spectre_tpu.models.spectre_branch import SpectreBranch
from spectre_tpu.models.vit import ViT

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def resolve_dtype(name: str):
    """Public config-string -> jnp dtype lookup (``compute_dtype`` /
    ``param_dtype`` values). Raises a clear error for unknown names instead
    of the bare KeyError a private-table lookup would give."""
    try:
        return _DTYPES[name]
    except KeyError:
        raise ValueError(
            f"unknown dtype name {name!r}; expected one of {sorted(_DTYPES)}"
        ) from None


def build_model(config: SimpleNamespace):
    """Instantiate the configured model (linen module, not yet initialized)."""
    name = getattr(config, "model", "spectre_vit")
    dtype = resolve_dtype(getattr(config, "compute_dtype", "float32"))
    param_dtype = resolve_dtype(getattr(config, "param_dtype", "float32"))
    # Pallas kernels compile only on TPU backends; on CPU (tests, dry runs)
    # the jnp reference path is the same math and much faster than interpret
    use_pallas = bool(getattr(config, "use_pallas", False)) and \
        jax.default_backend() in ("tpu", "axon")
    common = dict(
        img_size=config.img_size,
        patch_size=config.patch_size,
        in_channels=config.in_channels,
        num_classes=config.num_classes,
        embed_dim=config.embed_dim,
        num_encoders=config.num_encoders,
        num_heads=config.num_heads,
        hidden_dim=config.hidden_dim,
        dropout=config.dropout,
        dtype=dtype,
        param_dtype=param_dtype,
    )
    mix_impl = getattr(config, "mix_impl", "gather")
    mix_block = int(getattr(config, "mix_block", 0))
    if name == "vit":
        return ViT(use_pallas=use_pallas, **common)
    if name == "spectre_vit":
        return SpectreViT(method=getattr(config, "method", "permut_mix"),
                          mix_impl=mix_impl, mix_block=mix_block,
                          use_pallas=use_pallas, **common)
    if name == "spectre_branch":
        return SpectreBranch(method=getattr(config, "method", "permut_mix"),
                             mix_impl=mix_impl, mix_block=mix_block,
                          use_pallas=use_pallas, **common)
    raise ValueError(f"unknown model {name!r}; expected vit|spectre_vit|spectre_branch")


def example_input(config: SimpleNamespace, batch_size: int | None = None) -> jnp.ndarray:
    b = batch_size or config.batch_size
    return jnp.zeros((b, config.in_channels, config.img_size, config.img_size), jnp.float32)
