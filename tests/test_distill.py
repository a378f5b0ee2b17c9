from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.distill import DinoClassifier, DinoVisionTransformer, import_torch_state_dict


def tiny_teacher(img_size=32, variant="v3"):
    return DinoVisionTransformer(img_size=img_size, patch_size=16, embed_dim=32,
                                 depth=2, num_heads=2, num_registers=2,
                                 variant=variant)


def test_teacher_forward_features_contract(rng):
    bb = tiny_teacher()
    x = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    variables = bb.init(jax.random.key(0), x)
    out = bb.apply(variables, x)
    assert set(out) == {"x_norm_clstoken", "x_norm_regtokens", "x_norm_patchtokens"}
    assert out["x_norm_clstoken"].shape == (2, 32)
    assert out["x_norm_regtokens"].shape == (2, 2, 32)
    assert out["x_norm_patchtokens"].shape == (2, 4, 32)
    # method= access works too (reference calls forward_features explicitly)
    out2 = bb.apply(variables, x, method="forward_features")
    np.testing.assert_array_equal(np.asarray(out["x_norm_clstoken"]),
                                  np.asarray(out2["x_norm_clstoken"]))


def test_dino_classifier(rng):
    clf = DinoClassifier(backbone=tiny_teacher(), num_classes=7)
    x = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    variables = clf.init(jax.random.key(0), x)
    logits, feats = clf.apply(variables, x, return_features=True)
    assert logits.shape == (2, 7)
    assert feats.shape == (2, 32)


def test_torch_state_dict_import(rng):
    """torch-layout tensors must land in the right flax leaves (weight
    transposes, fused-qkv split). Uses the v2 (pos-embed) layout; the v3
    (RoPE/storage_tokens) layout is covered in tests/test_distill_rope.py."""
    bb = tiny_teacher(variant="v2")
    x = jnp.zeros((1, 3, 32, 32))
    params = bb.init(jax.random.key(0), x)["params"]
    E = 32
    g = np.random.default_rng(0)
    sd = {
        "cls_token": g.normal(size=(1, 1, E)).astype(np.float32),
        "register_tokens": g.normal(size=(1, 2, E)).astype(np.float32),
        "pos_embed": g.normal(size=(1, 5, E)).astype(np.float32),
        "patch_embed.proj.weight": g.normal(size=(E, 3, 16, 16)).astype(np.float32),
        "patch_embed.proj.bias": g.normal(size=(E,)).astype(np.float32),
        "norm.weight": g.normal(size=(E,)).astype(np.float32),
        "norm.bias": g.normal(size=(E,)).astype(np.float32),
        "blocks.0.attn.qkv.weight": g.normal(size=(3 * E, E)).astype(np.float32),
        "blocks.0.attn.qkv.bias": g.normal(size=(3 * E,)).astype(np.float32),
        "blocks.0.attn.proj.weight": g.normal(size=(E, E)).astype(np.float32),
        "blocks.0.attn.proj.bias": g.normal(size=(E,)).astype(np.float32),
        "blocks.0.mlp.fc1.weight": g.normal(size=(4 * E, E)).astype(np.float32),
        "blocks.0.mlp.fc1.bias": g.normal(size=(4 * E,)).astype(np.float32),
        "blocks.0.mlp.fc2.weight": g.normal(size=(E, 4 * E)).astype(np.float32),
        "blocks.0.mlp.fc2.bias": g.normal(size=(E,)).astype(np.float32),
        "blocks.0.norm1.weight": np.ones(E, np.float32),
        "blocks.0.norm1.bias": np.zeros(E, np.float32),
        "blocks.0.norm2.weight": np.ones(E, np.float32),
        "blocks.0.norm2.bias": np.zeros(E, np.float32),
        "blocks.0.ls1.gamma": np.full(E, 0.5, np.float32),
        "blocks.0.ls2.gamma": np.full(E, 0.5, np.float32),
    }
    new_params, unused = import_torch_state_dict(bb, params, sd)
    assert unused == []
    np.testing.assert_allclose(
        np.asarray(new_params["cls_token"]), sd["cls_token"])
    # torch fc1 weight [out, in] -> flax kernel [in, out]
    np.testing.assert_allclose(
        np.asarray(new_params["block_0"]["mlp"]["fc1"]["kernel"]),
        sd["blocks.0.mlp.fc1.weight"].T)
    # conv patch embed folded to the dense patchify layout
    np.testing.assert_allclose(
        np.asarray(new_params["patch_embed"]["kernel"]),
        sd["patch_embed.proj.weight"].reshape(E, -1).T)
    # qkv split: query kernel [E, H, hd]
    q = np.asarray(new_params["block_0"]["attn"]["query"]["kernel"])
    assert q.shape == (E, 2, 16)
    np.testing.assert_allclose(
        q.reshape(E, E), sd["blocks.0.attn.qkv.weight"][:E].T)
    # LayerScale
    np.testing.assert_allclose(np.asarray(new_params["block_0"]["ls1_gamma"]),
                               sd["blocks.0.ls1.gamma"])


def test_distill_loop_smoke(tmp_path):
    from spectre_tpu.distill.loop import distill_from_config
    from spectre_tpu.distill.teacher import DinoClassifier

    cfg = SimpleNamespace(
        model="spectre_vit", method="permut_mix", dataset="mnist",
        img_size=8, patch_size=4, in_channels=1, num_classes=10,
        embed_dim=16, num_encoders=1, num_heads=2, hidden_dim=32,
        dropout=0.0, batch_size=8, epochs=1, learning_rate=1e-3,
        random_seed=0, compute_dtype="float32", param_dtype="float32",
        checkpoint_dir=str(tmp_path),
    )
    teacher = DinoClassifier(backbone=tiny_teacher(img_size=16), num_classes=10)
    x = jnp.zeros((1, 3, 16, 16))
    tvars = teacher.init(jax.random.key(1), x)
    state, metrics = distill_from_config(
        cfg, max_steps=2, synthetic=True, teacher=teacher,
        teacher_variables=tvars, write_metrics=False)
    assert int(state.step) == 2
    assert np.isfinite(metrics["loss"])
    assert {"loss_dist", "loss_ce"} <= set(metrics)
