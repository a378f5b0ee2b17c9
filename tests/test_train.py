import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from spectre_tpu.models import build_model
from spectre_tpu.parallel import create_mesh, replicated_sharding, shard_batch
from spectre_tpu.train import (
    create_train_state,
    cross_entropy_loss,
    distill_loss,
    make_distill_step,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from spectre_tpu.train.optim import make_schedule


def tiny_config(**over):
    cfg = SimpleNamespace(
        model="spectre_vit", method="permut_mix", dataset="mnist",
        img_size=8, patch_size=4, in_channels=1, num_classes=10,
        embed_dim=16, num_encoders=2, num_heads=2, hidden_dim=32,
        dropout=0.0, batch_size=8, val_batch_size=8, epochs=2,
        learning_rate=1e-3, adam_weight_decay=0.01, adam_betas=(0.9, 0.999),
        random_seed=0, compute_dtype="float32", param_dtype="float32",
    )
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg


def _state_and_batch(cfg, mesh=None):
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    x = jnp.zeros((cfg.batch_size, cfg.in_channels, cfg.img_size, cfg.img_size))
    state = create_train_state(model, tx, x, seed=0)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=x.shape).astype(np.float32),
        "label": rng.integers(0, cfg.num_classes, cfg.batch_size).astype(np.int32),
    }
    if mesh is not None:
        state = jax.device_put(state, replicated_sharding(mesh))
        batch = shard_batch(mesh, batch)
    else:
        batch = jax.tree.map(jnp.asarray, batch)
    return model, state, batch


def test_cross_entropy_matches_manual():
    logits = jnp.asarray([[2.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    labels = jnp.asarray([0, 2])
    expected = -np.mean([
        np.log(np.exp(2) / (np.exp(2) + 1 + np.exp(-1))),
        np.log(1 / (1 + np.e + 1)),
    ])
    np.testing.assert_allclose(float(cross_entropy_loss(logits, labels)), expected, rtol=1e-6)


def test_distill_loss_zero_when_identical():
    logits = jnp.asarray([[2.0, -1.0, 0.5]])
    labels = jnp.asarray([0])
    loss, parts = distill_loss(logits, logits, labels, kd_weight=1.0, ce_weight=0.0)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)
    assert float(parts["loss_dist"]) == pytest.approx(0.0, abs=1e-6)


def test_schedule_cosine_decays_to_zero():
    cfg = tiny_config(epochs=10)
    sched = make_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)


def test_schedule_warmup():
    cfg = tiny_config(epochs=10, warmup_steps=10)
    sched = make_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(0.0, abs=1e-9)
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)


def test_train_step_reduces_loss_single_device():
    cfg = tiny_config()
    model, state, batch = _state_and_batch(cfg)
    step = make_train_step(model)
    state, first = step(state, batch["image"], batch["label"])
    for _ in range(30):
        state, metrics = step(state, batch["image"], batch["label"])
    assert float(metrics["loss"]) < float(first["loss"])
    assert int(state.step) == 31


def test_train_step_on_mesh_matches_metrics(devices):
    """DP over 8 virtual devices must produce the same loss as 1 device."""
    cfg = tiny_config(batch_size=16)
    mesh = create_mesh(devices)
    model, state1, batch1 = _state_and_batch(cfg)
    _, state8, batch8 = _state_and_batch(cfg, mesh=mesh)
    step = make_train_step(model)
    state1, m1 = step(state1, batch1["image"], batch1["label"])
    state8, m8 = step(state8, batch8["image"], batch8["label"])
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-5)
    # params stay numerically identical after the update
    p1 = jax.tree.leaves(state1.params)[0]
    p8 = jax.tree.leaves(state8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), rtol=1e-4, atol=1e-6)


def test_eval_step_padding_exact():
    cfg = tiny_config()
    model, state, batch = _state_and_batch(cfg)
    eval_step = make_eval_step(model)
    # full batch
    full = eval_step(state.params, state.buffers, batch["image"], batch["label"],
                     jnp.ones(8, bool))
    # pad 4 garbage rows; an 8-true mask over a 12-row batch must equal the
    # full result (per-sample masks replaced scalar valid counts so padding
    # stays correct when global batches span processes — see make_eval_step)
    img_pad = jnp.concatenate([batch["image"], jnp.zeros_like(batch["image"][:4])])
    lab_pad = jnp.concatenate([batch["label"], jnp.zeros(4, jnp.int32)])
    mask_pad = jnp.arange(12) < 8
    padded_model_batch = eval_step(state.params, state.buffers, img_pad[:12],
                                   lab_pad[:12], mask_pad)
    np.testing.assert_allclose(float(full["loss_sum"]),
                               float(padded_model_batch["loss_sum"]), rtol=1e-5)
    assert int(full["correct"]) == int(padded_model_batch["correct"])


def test_distill_step_runs_and_updates():
    cfg = tiny_config()
    model, state, batch = _state_and_batch(cfg)
    teacher_logits = jnp.tile(jnp.arange(10, dtype=jnp.float32),
                              (cfg.batch_size, 1))
    step = make_distill_step(model)
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    state, metrics = step(state, batch["image"], teacher_logits, batch["label"])
    assert set(metrics) >= {"loss", "accuracy", "loss_dist", "loss_ce"}
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(p0, np.asarray(jax.tree.leaves(state.params)[0]))


def test_checkpoint_save_restore_roundtrip(tmp_path):
    from spectre_tpu.train.checkpoint import CheckpointManager

    cfg = tiny_config()
    model, state, batch = _state_and_batch(cfg)
    step = make_train_step(model)
    for _ in range(3):
        state, _ = step(state, batch["image"], batch["label"])
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(state, {"accuracy": 0.5})
    mgr.wait()

    _, fresh, _ = _state_and_batch(cfg)
    restored = mgr.restore(fresh)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.buffers), jax.tree.leaves(state.buffers)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues identically from the restored state
    s1, m1 = step(state, batch["image"], batch["label"])
    s2, m2 = step(restored, batch["image"], batch["label"])
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    mgr.close()


def test_train_from_config_smoke(tmp_path):
    from spectre_tpu.train.loop import train_from_config

    cfg = tiny_config(epochs=1, checkpoint_dir=str(tmp_path), log_every=1)
    result = train_from_config(cfg, max_steps=3, synthetic=True,
                               checkpoint=False, write_metrics=False)
    assert result.last_val_accuracy >= 0.0
    assert int(result.state.step) == 3


def test_resume_continues_epochs_not_restarts(tmp_path):
    """--resume picks up at the restored epoch: a finished run does ZERO
    additional steps, and raising config.epochs trains only the delta
    (round-2 review: the loop previously ran the full config.epochs AGAIN
    past the exhausted cosine schedule)."""
    from spectre_tpu.train.loop import train_from_config

    def cfg(epochs):
        return SimpleNamespace(
            model="spectre_vit", method="permut_mix", dataset="mnist",
            img_size=8, patch_size=4, in_channels=1, num_classes=10,
            embed_dim=16, num_encoders=1, num_heads=2, hidden_dim=24,
            dropout=0.0, batch_size=512, val_batch_size=512, epochs=epochs,
            learning_rate=1e-3, random_seed=0, compute_dtype="float32",
            checkpoint_dir=str(tmp_path), keep_checkpoints=2,
        )

    r1 = train_from_config(cfg(2), synthetic=True, write_metrics=False)
    steps_after_2 = int(r1.state.step)
    assert steps_after_2 > 0

    # same epoch budget + resume: nothing left to do
    r2 = train_from_config(cfg(2), synthetic=True, resume=True,
                           write_metrics=False)
    assert int(r2.state.step) == steps_after_2

    # raised budget: exactly the delta epochs run
    r3 = train_from_config(cfg(4), synthetic=True, resume=True,
                           write_metrics=False)
    assert int(r3.state.step) == 2 * steps_after_2


def test_mid_epoch_resume_skips_trained_prefix(tmp_path):
    """A MID-epoch restore (the preemption case) must finish at exactly
    epochs*steps_per_epoch — skipping the interrupted epoch's trained
    prefix — not replay it and overrun the cosine schedule (round-3
    review finding)."""
    from spectre_tpu.train.loop import train_from_config

    cfg = SimpleNamespace(
        model="spectre_vit", method="permut_mix", dataset="mnist",
        img_size=8, patch_size=4, in_channels=1, num_classes=10,
        embed_dim=16, num_encoders=1, num_heads=2, hidden_dim=24,
        dropout=0.0, batch_size=512, val_batch_size=512, epochs=1,
        learning_rate=1e-3, random_seed=0, compute_dtype="float32",
        checkpoint_dir=str(tmp_path), keep_checkpoints=2,
    )
    # synthetic mnist train split is 4096 -> 8 steps/epoch at B=512
    r1 = train_from_config(cfg, synthetic=True, max_steps=3,
                           write_metrics=False)
    assert int(r1.state.step) == 3
    r2 = train_from_config(cfg, synthetic=True, resume=True,
                           write_metrics=False)
    assert int(r2.state.step) == 8  # pre-fix: 3 + 8 = 11 (overran schedule)


def test_preemption_save_skips_val_sweep(tmp_path, monkeypatch):
    """On SIGTERM the loop must finish the current step, SKIP the epoch-tail
    validation sweep, and checkpoint immediately — the grace window belongs
    to the save, not an eval pass that can be SIGKILLed first (round-3
    review finding). Observable: preempted in the FIRST epoch means val
    never ran (last_val_accuracy stays -1), yet a resumable checkpoint
    exists at the preempted step. The signal is raised from inside the
    batch generator (after the 2nd batch) so it deterministically lands
    while the loop's own handler is installed."""
    import signal

    import spectre_tpu.train.loop as tl
    from spectre_tpu.train.loop import train_from_config

    real_prefetch = tl.prefetch_to_mesh

    def prefetch_and_preempt(it, mesh, **kw):
        for i, b in enumerate(real_prefetch(it, mesh, **kw)):
            yield b
            if i == 1:
                os.kill(os.getpid(), signal.SIGTERM)

    cfg = SimpleNamespace(
        model="spectre_vit", method="permut_mix", dataset="mnist",
        img_size=8, patch_size=4, in_channels=1, num_classes=10,
        embed_dim=16, num_encoders=1, num_heads=2, hidden_dim=24,
        dropout=0.0, batch_size=64, val_batch_size=64,
        epochs=500,  # cannot finish: the preemption is the only exit
        learning_rate=1e-3, random_seed=0, compute_dtype="float32",
        checkpoint_dir=str(tmp_path), keep_checkpoints=2,
    )
    monkeypatch.setattr(tl, "prefetch_to_mesh", prefetch_and_preempt)
    r = train_from_config(cfg, synthetic=True, write_metrics=False)
    monkeypatch.setattr(tl, "prefetch_to_mesh", real_prefetch)
    assert int(r.state.step) > 0
    assert r.last_val_accuracy == -1.0, "val sweep ran after preemption"
    # the preemption checkpoint is restorable: resume continues from it
    r2 = train_from_config(cfg, synthetic=True, resume=True,
                           max_steps=int(r.state.step) + 1,
                           write_metrics=False)
    assert int(r2.state.step) == int(r.state.step) + 1


def test_fast_rng_identical_outside_rng_consumers():
    """fast_rng only swaps the PRNG stream feeding dropout/augment draws —
    with no augmentation and dropout=0 there are no in-step RNG consumers,
    so the two modes must produce BIT-IDENTICAL losses and updates (any
    drift would mean the key rewrap leaked into model numerics)."""
    cfg = tiny_config()
    model, state_a, batch = _state_and_batch(cfg)
    _, state_b, _ = _state_and_batch(cfg)
    step_fast = make_train_step(model, fast_rng=True)
    step_tf = make_train_step(model, fast_rng=False)
    for _ in range(3):
        state_a, ma = step_fast(state_a, batch["image"], batch["label"])
        state_b, mb = step_tf(state_b, batch["image"], batch["label"])
    assert float(ma["loss"]) == float(mb["loss"])
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_shard_local_augment_removes_pixel_gather(devices):
    """config.shard_local_augment routes the augmentation through
    _shard_augment (shard_map over the data axis): the GSPMD formulation's
    pixel-source all-gather (the round-5 collective-audit finding)
    disappears, the step still trains. The default stays GSPMD (the gather
    is 12.6 MB over ICI and shard-local draws are mesh-layout-dependent)."""
    from spectre_tpu.data import make_train_augment
    from spectre_tpu.parallel import audit_compiled

    cfg = tiny_config(batch_size=16, in_channels=3)
    mesh = create_mesh(devices)
    model, state, batch = _state_and_batch(cfg, mesh=mesh)
    aug = make_train_augment((0.5,) * 3, (0.25,) * 3)
    step_gspmd = make_train_step(model, augment_fn=aug)
    step_local = make_train_step(model, augment_fn=aug, mesh=mesh)
    cg = audit_compiled(step_gspmd.lower(
        state, batch["image"], batch["label"]))
    cl = audit_compiled(step_local.lower(
        state, batch["image"], batch["label"]))
    # the documented GSPMD pixel gather exists on the default path...
    assert cg.get("_augment_gathers", 0) >= 1, cg
    # ...and the shard-local path removes it without adding collectives
    assert cl.get("_augment_gathers", 0) == 0, cl
    assert cl.get("all-gather", 0) == 0, cl
    state, m = step_local(state, batch["image"], batch["label"])
    assert np.isfinite(float(m["loss"]))
