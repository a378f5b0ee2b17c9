"""Gradient accumulation: scan-of-microbatches == full-batch update.

With dropout/augment off, accumulating over A equal microbatches must give
the same parameter update as the full batch (mean-of-means identity), up to
f32 reduction-order noise; and the knob must thread from the config into
the training loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
from types import SimpleNamespace

from spectre_tpu.models import SpectreViT
from spectre_tpu.train import create_train_state, make_optimizer, make_train_step

KW = dict(img_size=8, patch_size=4, in_channels=3, num_classes=5,
          embed_dim=16, num_encoders=1, num_heads=2, hidden_dim=24,
          dropout=0.0)


def _state(model, batch):
    cfg = SimpleNamespace(learning_rate=1e-3, epochs=1)
    return create_train_state(model, make_optimizer(cfg, 10),
                              jnp.zeros((batch, 3, 8, 8)), seed=0)


def test_accum_matches_full_batch():
    model = SpectreViT(**KW)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (8, 3, 8, 8)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, 8).astype(np.int32))

    s_full = _state(model, 8)
    s_acc = _state(model, 8)
    step_full = make_train_step(model)
    step_acc = make_train_step(model, grad_accum_steps=4)

    s_full, m_full = step_full(s_full, x, y)
    s_acc, m_acc = step_acc(s_acc, x, y)

    np.testing.assert_allclose(float(m_acc["loss"]), float(m_full["loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m_acc["accuracy"]),
                               float(m_full["accuracy"]), atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_acc.params), jax.tree.leaves(s_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    assert int(s_acc.step) == 1  # one optimizer update, not A


def test_accum_threads_from_config(tmp_path):
    from spectre_tpu.train.loop import train_from_config

    cfg = SimpleNamespace(
        model="spectre_vit", method="permut_mix", dataset="mnist",
        img_size=8, patch_size=4, in_channels=1, num_classes=10,
        embed_dim=16, num_encoders=1, num_heads=2, hidden_dim=24,
        dropout=0.0, batch_size=8, val_batch_size=8, epochs=1,
        learning_rate=1e-3, random_seed=0, grad_accum_steps=2,
        compute_dtype="float32", logdir=str(tmp_path),
    )
    result = train_from_config(cfg, synthetic=True, max_steps=2,
                               checkpoint=False)
    assert result.last_val_accuracy >= 0.0
