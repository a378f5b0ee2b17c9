"""Tensor-parallel sharding: DP+TP over a (4, 2) mesh must be numerically
identical to single-device execution (GSPMD inserts the collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from spectre_tpu.models import SpectreViT, ViT
from spectre_tpu.parallel import (
    SPECTRE_TP_RULES,
    VIT_TP_RULES,
    apply_tp,
    create_mesh,
    shard_batch,
    tp_shardings,
)
from spectre_tpu.train import create_train_state, make_train_step
import optax


def _vit(batch):
    model = ViT(img_size=8, patch_size=4, in_channels=3, num_classes=10,
                embed_dim=16, num_encoders=2, num_heads=2, hidden_dim=32,
                dropout=0.0)
    x = jnp.zeros((batch, 3, 8, 8))
    return model, x


def test_tp_shardings_match_rules(devices):
    mesh = create_mesh(devices, data_parallel=4, model_parallel=2)
    model, x = _vit(8)
    params = model.init(jax.random.key(0), x)["params"]
    sh = tp_shardings(params, mesh, VIT_TP_RULES)
    assert sh["encoder_0"]["linear1"]["kernel"].spec == P(None, "model")
    assert sh["encoder_0"]["linear2"]["kernel"].spec == P("model", None)
    assert sh["encoder_0"]["self_attn"]["mhsa"]["query"]["kernel"].spec == \
        P(None, "model", None)
    # non-matching leaves replicate
    assert sh["mlp_head"]["kernel"].spec == P()


@pytest.mark.parametrize("model_kind", ["vit", "spectre"])
def test_dp_tp_train_step_matches_single_device(devices, model_kind):
    mesh = create_mesh(devices, data_parallel=4, model_parallel=2)
    batch = 8
    if model_kind == "vit":
        model, x0 = _vit(batch)
        rules = VIT_TP_RULES
    else:
        model = SpectreViT(img_size=8, patch_size=4, in_channels=3,
                           num_classes=10, embed_dim=16, num_encoders=2,
                           num_heads=2, hidden_dim=32, dropout=0.0)
        x0 = jnp.zeros((batch, 3, 8, 8))
        rules = SPECTRE_TP_RULES

    tx = optax.adamw(1e-3)
    rng = np.random.default_rng(0)
    images = rng.standard_normal(x0.shape).astype(np.float32)
    labels = rng.integers(0, 10, batch).astype(np.int32)

    step = make_train_step(model)

    # single device
    s1 = create_train_state(model, tx, x0, seed=0)
    s1, m1 = step(s1, jnp.asarray(images), jnp.asarray(labels))
    s1, m1 = step(s1, jnp.asarray(images), jnp.asarray(labels))

    # DP(4) x TP(2)
    s2 = create_train_state(model, tx, x0, seed=0)
    s2 = apply_tp(s2, mesh, rules)
    batch2 = shard_batch(mesh, {"image": images, "label": labels})
    s2, m2 = step(s2, batch2["image"], batch2["label"])
    s2, m2 = step(s2, batch2["image"], batch2["label"])

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5, atol=1e-6)
    # a TP-sharded param updated identically
    k1 = np.asarray(jax.tree.leaves(s1.params)[0])
    k2 = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(k1, k2, rtol=1e-4, atol=1e-6)
    # and params really are sharded over the model axis
    flat = jax.tree_util.tree_flatten_with_path(s2.params)[0]
    sharded = [lf for p, lf in flat if "model" in str(lf.sharding.spec)]
    assert sharded, "no param ended up model-sharded"
