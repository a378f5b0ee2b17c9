import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectre_tpu.configs import parse_config
from spectre_tpu.models import (
    MIXERS,
    MHPermutMix,
    SpectreLinear,
    SpectreViT,
    ViT,
    build_model,
    example_input,
    make_mixer,
)

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "spectre_tpu", "configs")


def tiny_kwargs(**over):
    kw = dict(img_size=8, patch_size=4, in_channels=3, num_classes=10,
              embed_dim=16, num_encoders=2, num_heads=2, hidden_dim=32,
              dropout=0.0)
    kw.update(over)
    return kw


def test_spectre_linear_shapes_and_identity_residual(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 16)).astype(np.float32))
    mod = SpectreLinear(16)
    params = mod.init(jax.random.key(0), x)
    y = mod.apply(params, x)
    assert y.shape == (2, 5, 16)
    # zero weights/bias => LN(0)=0 => GELU(0)=0 => output == identity residual
    zeroed = jax.tree.map(jnp.zeros_like, params)
    y0 = mod.apply(zeroed, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x), atol=1e-6)


def test_mhpermutmix_buffers_reproducible():
    x = jnp.ones((2, 5, 8))
    mod = MHPermutMix(embed_dim=8, token_dim=5, num_heads=3, out_channels=8)
    v1 = mod.init(jax.random.key(7), x)
    v2 = mod.init(jax.random.key(7), x)
    p1 = np.asarray(v1["buffers"]["mix_tables"][0])
    np.testing.assert_array_equal(p1, np.asarray(v2["buffers"]["mix_tables"][0]))
    assert p1.shape == (3, 40)
    out = mod.apply(v1, x)
    assert out.shape == (2, 5, 8)


@pytest.mark.parametrize("method", MIXERS)
def test_all_mixers_shape_preserving(method, rng):
    B, N, E, H = 2, 5, 16, 2  # N odd on purpose (CLS+even patches)
    x = jnp.asarray(rng.standard_normal((B, N, E)).astype(np.float32))
    mixer = make_mixer(method, embed_dim=E, seq_length=N, num_heads=H)
    params = mixer.init(jax.random.key(0), x)
    y = mixer.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("method", list(MIXERS))
def test_spectre_vit_forward_and_features(method, rng):
    model = SpectreViT(method=method, **tiny_kwargs())
    x = jnp.asarray(rng.standard_normal((2, 3, 8, 8)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (2, 10)
    logits2, feats = model.apply(params, x, return_features=True)
    assert feats.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), rtol=1e-6)


def test_vit_attention_is_per_sample(rng):
    """Attention must mix tokens, never batch entries (the reference's
    batch_first bug attended across the batch; vit.py:30-38)."""
    model = ViT(**tiny_kwargs())
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))
    joint = np.asarray(model.apply(params, jnp.asarray(x)))
    solo0 = np.asarray(model.apply(params, jnp.asarray(x[:1])))
    np.testing.assert_allclose(joint[:1], solo0, rtol=2e-4, atol=1e-5)


def test_dropout_rng_changes_training_output(rng):
    model = SpectreViT(method="fft_bare", **tiny_kwargs(dropout=0.5))
    x = jnp.asarray(rng.standard_normal((2, 3, 8, 8)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    y1 = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.key(1)})
    y2 = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # eval mode is deterministic
    e1 = model.apply(params, x)
    e2 = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


@pytest.mark.parametrize(
    "cfg", ["vit_mnist", "spectre_vit_mnist", "fnet_mnist", "spectre_branch",
            "vit_cifar100", "fnet_cifar100", "spectre_vit_cifar100", "dwt_cifar100"]
)
def test_build_model_from_config_forward(cfg, rng):
    c = parse_config(os.path.join(CFG_DIR, cfg + ".py"))
    # shrink for test speed
    c.embed_dim = max(16, getattr(c, "num_heads", 1))
    c.hidden_dim = 32
    c.num_encoders = 2
    c.compute_dtype = "float32"
    model = build_model(c)
    x = example_input(c, batch_size=2)
    x = x + jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (2, c.num_classes)
    assert np.isfinite(np.asarray(logits)).all()


def test_spectre_vit_gradients_flow(rng):
    model = SpectreViT(method="permut_mix", **tiny_kwargs())
    x = jnp.asarray(rng.standard_normal((2, 3, 8, 8)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    params, buffers = variables["params"], variables["buffers"]

    def loss_fn(p):
        out = model.apply({"params": p, "buffers": buffers}, x)
        return jnp.sum(out**2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # at least the patch-embed freq weights and the head must receive gradient
    g_freq = grads["embeddings_block"]["freq_weight_h"]
    assert float(jnp.abs(g_freq).sum()) > 0


def test_flagship_config_block_tables_real_at_divisible_geometry(rng):
    """The flagship config ships mix_block=64; at most test geometries 64
    does not divide d and the model falls back to uniform (loudly). This
    test pins a scaled geometry where the BLOCK distribution is actually
    sampled — embed 64 keeps token_dim 65, d = 65*64 = 4160 = 65 blocks —
    so CI exercises the shipped sampling path, not just the fallback
    (VERDICT r3 weak-1)."""
    import warnings

    from spectre_tpu.ops import detect_block_size

    c = parse_config(os.path.join(CFG_DIR, "spectre_vit_cifar100.py"))
    c.embed_dim = 64
    c.hidden_dim = 32
    c.num_encoders = 1
    c.compute_dtype = "float32"
    assert int(c.mix_block) == 64  # the shipped default, untouched
    model = build_model(c)
    x = example_input(c, batch_size=2)
    x = x + jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "error", message=".*sampling UNIFORM permutation tables.*")
        params = model.init(jax.random.key(0), x)
        logits = model.apply(params, x)
    assert logits.shape == (2, c.num_classes)
    assert np.isfinite(np.asarray(logits)).all()
    perms = [v[0] for path, v in _walk_buffers(params["buffers"])
             if path and path[-1] == "mix_tables"]
    assert perms and all(detect_block_size(np.asarray(p)) == 64
                         for p in perms)


def _walk_buffers(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == "mix_tables":
                yield path + (k,), v
            else:
                yield from _walk_buffers(v, path + (k,))

