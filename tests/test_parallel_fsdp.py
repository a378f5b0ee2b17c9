"""FSDP (ZeRO-3) sharding: params + AdamW moments sharded over the data axis
must be numerically identical to single-device execution (GSPMD derives the
per-weight all-gathers and gradient reduce-scatters from the annotations),
must actually shard the memory, and must compose with the TP rules."""

import jax
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

import jax.numpy as jnp

from spectre_tpu.models import SpectreViT
from spectre_tpu.parallel import (
    SPECTRE_TP_RULES,
    apply_fsdp,
    create_mesh,
    fsdp_shardings,
    pin_step_shardings,
    shard_batch,
)
from spectre_tpu.train import create_train_state, make_train_step


def _spectre(batch):
    # embed 64 / 2 heads: the mix projection kernel is [N*E*H, E] =
    # [2*2+1=5 tokens -> 5*64*2, 64] — large enough to cross MIN_SHARD_SIZE
    model = SpectreViT(img_size=8, patch_size=4, in_channels=3,
                       num_classes=10, embed_dim=64, num_encoders=2,
                       num_heads=2, hidden_dim=128, dropout=0.0)
    x = jnp.zeros((batch, 3, 8, 8))
    return model, x


def test_fsdp_shardings_pick_largest_divisible_axis(devices):
    mesh = create_mesh(devices, data_parallel=8)
    model, x = _spectre(8)
    params = model.init(jax.random.key(0), x)["params"]
    sh = fsdp_shardings(params, mesh, min_size=1024)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    shd = dict((tuple(str(getattr(k, "key", k)) for k in p),
                sh_leaf) for (p, _), sh_leaf in
               zip(flat, jax.tree.leaves(sh)))
    # every sharded leaf: the data axis sits on its largest divisible dim
    n_sharded = 0
    for (path, leaf), sh_leaf in zip(flat, jax.tree.leaves(sh)):
        spec = list(sh_leaf.spec) + [None] * (leaf.ndim - len(sh_leaf.spec))
        if "data" in spec:
            n_sharded += 1
            d = spec.index("data")
            assert leaf.shape[d] % 8 == 0
            for j, s in enumerate(leaf.shape):
                if s > leaf.shape[d]:
                    assert s % 8, (
                        f"{path}: larger divisible dim {j} left unsharded")
        elif leaf.size >= 1024:
            # only unshardable shapes may stay replicated above the threshold
            assert not any(s >= 8 and s % 8 == 0 for s in leaf.shape)
    assert n_sharded >= 4, "FSDP sharded almost nothing"


def test_fsdp_small_leaves_replicate(devices):
    mesh = create_mesh(devices, data_parallel=8)
    model, x = _spectre(8)
    params = model.init(jax.random.key(0), x)["params"]
    sh = fsdp_shardings(params, mesh)  # default MIN_SHARD_SIZE = 2**14
    for leaf, sh_leaf in zip(jax.tree.leaves(params), jax.tree.leaves(sh)):
        if leaf.size < 2 ** 14:
            assert sh_leaf.spec == P(), (leaf.shape, sh_leaf.spec)


def test_fsdp_train_step_matches_single_device(devices):
    mesh = create_mesh(devices, data_parallel=8)
    batch = 16
    model, x0 = _spectre(batch)
    tx = optax.adamw(1e-3)
    rng = np.random.default_rng(0)
    images = rng.standard_normal(x0.shape).astype(np.float32)
    labels = rng.integers(0, 10, batch).astype(np.int32)
    step = make_train_step(model)

    s1 = create_train_state(model, tx, x0, seed=0)
    for _ in range(2):
        s1, m1 = step(s1, jnp.asarray(images), jnp.asarray(labels))

    s2 = create_train_state(model, tx, x0, seed=0)
    s2 = apply_fsdp(s2, mesh, min_size=1024)
    pinned = pin_step_shardings(step, s2)
    b = shard_batch(mesh, {"image": images, "label": labels})
    for _ in range(2):
        s2, m2 = pinned(s2, b["image"], b["label"])

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5, atol=1e-6)
    for a, c in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-6)


def test_fsdp_actually_shards_params_and_moments(devices):
    """The memory claim: each chip holds 1/8 of every sharded param AND of
    its AdamW mu/nu — not a replica that GSPMD reshards later."""
    mesh = create_mesh(devices, data_parallel=8)
    model, x0 = _spectre(8)
    s = create_train_state(model, tx=optax.adamw(1e-3), example_input=x0,
                           seed=0)
    s = apply_fsdp(s, mesh, min_size=1024)

    def shard_fraction(leaf):
        return leaf.addressable_shards[0].data.size / leaf.size

    sharded_params = [p for p in jax.tree.leaves(s.params)
                      if "data" in str(p.sharding.spec)]
    assert sharded_params
    assert all(shard_fraction(p) == 1 / 8 for p in sharded_params)
    # AdamW moments mirror the param shardings from step 0
    mu_sharded = [m for m in jax.tree.leaves(s.opt_state)
                  if m.ndim > 0 and "data" in str(m.sharding.spec)]
    assert len(mu_sharded) >= 2 * len(sharded_params), \
        "mu and nu should both carry the param shardings"
    assert all(shard_fraction(m) == 1 / 8 for m in mu_sharded)

    # the carried state keeps its shardings across steps (pinned — GSPMD's
    # free propagation measurably drifts params back toward replicated,
    # which is why pin_step_shardings exists): no layout churn, no recompile
    n_sharded = len(sharded_params)
    step = pin_step_shardings(make_train_step(model), s)
    b = shard_batch(mesh, {"image": np.zeros(x0.shape, np.float32),
                           "label": np.zeros(8, np.int32)})
    s2, _ = step(s, b["image"], b["label"])
    p0 = [p for p in jax.tree.leaves(s2.params)
          if "data" in str(p.sharding.spec)]
    assert len(p0) == n_sharded
    mu0 = [m for m in jax.tree.leaves(s2.opt_state)
           if m.ndim > 0 and "data" in str(m.sharding.spec)]
    assert len(mu0) == len(mu_sharded)


def test_fsdp_composes_with_tp(devices):
    """2-D layout: TP claims its dim over ``model``, FSDP shards a remaining
    dim over ``data`` — and the result still matches single-device."""
    mesh = create_mesh(devices, data_parallel=4, model_parallel=2)
    batch = 8
    model, x0 = _spectre(batch)
    tx = optax.adamw(1e-3)
    rng = np.random.default_rng(1)
    images = rng.standard_normal(x0.shape).astype(np.float32)
    labels = rng.integers(0, 10, batch).astype(np.int32)
    step = make_train_step(model)

    s1 = create_train_state(model, tx, x0, seed=0)
    s1, m1 = step(s1, jnp.asarray(images), jnp.asarray(labels))

    s2 = create_train_state(model, tx, x0, seed=0)
    s2 = apply_fsdp(s2, mesh, min_size=1024, tp_rules=SPECTRE_TP_RULES)
    pinned = pin_step_shardings(step, s2)
    b = shard_batch(mesh, {"image": images, "label": labels})
    s2, m2 = pinned(s2, b["image"], b["label"])

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5, atol=1e-6)
    # at least one leaf carries BOTH axes (the 2-D layout exists)
    both = [p for p in jax.tree.leaves(s2.params)
            if "data" in str(p.sharding.spec)
            and "model" in str(p.sharding.spec)]
    assert both, "no param is simultaneously TP- and FSDP-sharded"


def test_train_loop_fsdp_end_to_end_with_resume(tmp_path):
    """config.fsdp=True drives the real loop: sharded state trains, saves an
    orbax checkpoint, and resumes (StandardRestore lands on the template's
    FSDP shardings) — finishing at exactly epochs*steps_per_epoch."""
    from types import SimpleNamespace

    from spectre_tpu.train.loop import train_from_config

    cfg = SimpleNamespace(
        model="spectre_vit", method="permut_mix", dataset="mnist",
        img_size=8, patch_size=4, in_channels=1, num_classes=10,
        embed_dim=64, num_encoders=1, num_heads=2, hidden_dim=128,
        dropout=0.0, batch_size=512, val_batch_size=512, epochs=1,
        learning_rate=1e-3, random_seed=0, compute_dtype="float32",
        checkpoint_dir=str(tmp_path), keep_checkpoints=2, fsdp=True,
        fsdp_min_size=1024,  # the tiny test model's kernels are < 2**14
    )
    # synthetic mnist train split is 4096 -> 8 steps/epoch at B=512
    r1 = train_from_config(cfg, synthetic=True, max_steps=3,
                           write_metrics=False)
    assert int(r1.state.step) == 3
    assert any("data" in str(p.sharding.spec)
               for p in jax.tree.leaves(r1.state.params)), \
        "loop ran without FSDP shardings"
    r2 = train_from_config(cfg, synthetic=True, resume=True,
                           write_metrics=False)
    assert int(r2.state.step) == 8
    assert np.isfinite(r2.best_val_accuracy)


def test_train_loop_fsdp_with_block_mix_routes(tmp_path):
    """The multi-chip flagship combination: config.fsdp=True AND
    config.mix_block — the loop must register the MESH-AWARE block routes
    (the custom-VJP backward runs the Pallas block gather under shard_map
    over the batch axis) and the FSDP-pinned step must compile and train
    through it. Grad parity of the shard_map'd backward is pinned
    separately (tests/test_block_mix.py); this is the end-to-end path the
    flagship config (mix_block=64) takes on a multi-chip host."""
    from types import SimpleNamespace

    from spectre_tpu.ops import fused_mix
    from spectre_tpu.train.loop import train_from_config

    cfg = SimpleNamespace(
        model="spectre_vit", method="permut_mix", dataset="mnist",
        img_size=8, patch_size=4, in_channels=1, num_classes=10,
        embed_dim=64, num_encoders=2, num_heads=2, hidden_dim=128,
        dropout=0.0, batch_size=512, val_batch_size=512, epochs=1,
        learning_rate=1e-3, random_seed=0, compute_dtype="float32",
        checkpoint_dir=str(tmp_path), keep_checkpoints=2, fsdp=True,
        fsdp_min_size=1024, mix_block=8,  # d = 64*(4+1) = 320 = 40 blocks
    )
    # the loop registers routes into the process-global registry; clear on
    # the way out so later-collected tests never hit this geometry's stale
    # entries (the registry docstring's silent-wrong-permutation hazard)
    try:
        r = train_from_config(cfg, synthetic=True, max_steps=3,
                              write_metrics=False, checkpoint=False)
        assert int(r.state.step) == 3
        assert any("data" in str(p.sharding.spec)
                   for p in jax.tree.leaves(r.state.params)), \
            "loop ran without FSDP shardings"
        # the loop registered one mesh-aware block route per encoder layer
        assert len(fused_mix._MIX_ROUTES) == 2
        rt, impl, _reg_perms = next(iter(fused_mix._MIX_ROUTES.values()))
        assert impl == "block"
        # route tuple: (binv, bsrc, blk, (h, d), mesh, batch_axis) — the
        # round-4 forward route added the shape slot before mesh
        binv, bsrc, blk, shape, mesh, batch_axis = rt
        assert mesh is not None and mesh.size == jax.device_count(), \
            "block routes were registered without the mesh (single-chip kernel)"
    finally:
        fused_mix.clear_mix_routes()
