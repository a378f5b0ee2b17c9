"""Jitted train / eval / distillation steps.

The reference's hot loop (train.py:216-243) is an eager AMP-fp16 loop with a
GradScaler and a per-batch ``.item()`` device sync. The TPU-native design is a
single ``jit``-compiled step function over a data-parallel mesh:

- batch arrives sharded over the ``data`` mesh axis; params are replicated, so
  XLA derives the gradient all-reduce (psum over ICI) from shardings alone;
- bf16 compute (``compute_dtype`` config) replaces fp16+GradScaler — bf16 has
  fp32 range, no loss scaling needed;
- the returned metrics stay on device; callers batch D2H syncs per-epoch, not
  per-step (the reference synced every batch at train.py:243).

Distillation step: fused soft-target KL(T)+CE loss with the reference's
weighting (train.py:334-348: T=2, 0.25*KD*T^2 + 0.75*CE), teacher frozen, both
models on the same chips, data-parallel (BASELINE north star).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from spectre_tpu.train.state import TrainState


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels (torch CrossEntropyLoss
    semantics, train.py:196,226)."""
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def distill_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 2.0,
    kd_weight: float = 0.25,
    ce_weight: float = 0.75,
) -> tuple[jnp.ndarray, dict]:
    """Soft-target distillation loss, reference formulation (train.py:334-348):

        KD = T^2 * mean_B sum_c p_T (log p_T - log p_S),  p at temperature T
        loss = kd_weight * KD + ce_weight * CE(student, labels)
    """
    t = temperature
    # softmax statistics in f32 regardless of the models' compute dtype (the
    # teacher runs bf16 by default; KD targets should not lose mantissa)
    log_p_s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    log_p_t = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    p_t = jnp.exp(log_p_t)
    kd = (t * t) * jnp.sum(p_t * (log_p_t - log_p_s), axis=-1).mean()
    ce = cross_entropy_loss(student_logits, labels)
    loss = kd_weight * kd + ce_weight * ce
    return loss, {"loss_dist": kd, "loss_ce": ce}


def _accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32).mean()


def _fast_key(key):
    """Re-wrap a step key as ``unsafe_rbg`` so in-step sampling (dropout
    masks, augmentation draws) uses the hardware RngBitGenerator instead of
    threefry. Measured on the flagship step (BASELINE.md round-5): the FF
    GEMM fusions drag threefry Bernoulli epilogues at 5-8x their roofline
    for dropout=0.001 masks; this swap is 129.7 -> 118.9 ms/step (+8.3%
    img/s). The mask DISTRIBUTION is unchanged (i.i.d. Bernoulli draws) —
    only the counter-based stream implementation differs, and the reference
    uses torch's RNG stream anyway, so stream identity was never a parity
    surface. Deterministic for a fixed key on a fixed backend (exact-resume
    tests hold); ``fast_rng=False`` restores threefry. Strength note: the
    per-STEP key is derived in threefry space (``fold_in(state.rng, step)``
    happens before this conversion), so cross-step independence keeps
    threefry strength; only the within-step split into augment/dropout/
    microbatch keys uses rbg's weaker derivation — fine for masking, the
    only in-step consumer."""
    data = jax.random.key_data(key).ravel()
    return jax.random.wrap_key_data(
        jnp.tile(data, 4)[:4].astype(jnp.uint32), impl="unsafe_rbg")


def _shard_augment(augment_fn: Callable, mesh) -> Callable:
    """Run the augmentation shard-locally over the mesh's data axis.

    The rotation resample's fast formulation folds batch offsets into one
    flat index vector (benchmarks/rotate_variants.py: 4.9 vs 38.9 ms for
    the batch-local take_along_axis form on v5e), which GSPMD cannot prove
    batch-local — on a DP mesh it all-gathers the whole pixel source
    (caught by the round-5 collective audit). shard_map makes the locality
    structural: each shard flattens only its own batch slice, zero
    collectives, and the single-chip-fast formulation is kept. Each shard
    folds its axis index into the key so augmentation draws stay
    independent across shards."""
    from jax.sharding import PartitionSpec as P

    def body(key, images):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return augment_fn(key, images)

    return jax.shard_map(body, mesh=mesh, in_specs=(P(), P("data")),
                         out_specs=P("data"))


def make_train_step(model, augment_fn: Callable | None = None,
                    grad_accum_steps: int = 1, mesh=None,
                    fast_rng: bool = True) -> Callable:
    """Build the jitted train step. ``state`` is donated (buffers update in
    place in HBM); dropout/augmentation keys are folded from the state PRNG +
    step so the step stays a pure function of its inputs. When ``augment_fn``
    is given, device-side augmentation runs INSIDE the compiled step — one
    dispatch per step, raw pixels in, no host-side key management; pass
    ``mesh`` on multi-chip hosts so the augmentation runs shard-locally
    (see _shard_augment). ``fast_rng`` (default on) draws in-step dropout/
    augmentation randomness from the hardware RngBitGenerator (_fast_key:
    129.7 -> 118.9 ms/step measured on the flagship).

    ``grad_accum_steps`` > 1 splits the incoming batch into that many
    microbatches and accumulates gradients over a ``lax.scan`` before the
    single optimizer update — the standard TPU recipe for batch sizes whose
    activations exceed HBM (the flagship config OOMs at B=2048 without it,
    BASELINE.md). Numerics: mean-of-means over equal microbatches == the
    full-batch mean; each microbatch gets its own dropout/augment key.
    """

    aug = augment_fn
    if augment_fn is not None and mesh is not None and mesh.size > 1:
        aug = _shard_augment(augment_fn, mesh)

    def compute(state: TrainState, rng: jnp.ndarray,
                images: jnp.ndarray, labels: jnp.ndarray):
        if aug is not None:
            aug_rng, rng = jax.random.split(rng)
            images = aug(aug_rng, images)

        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "buffers": state.buffers},
                images,
                deterministic=False,
                rngs={"dropout": rng},
                mutable=["losses"],
            )
            loss = cross_entropy_loss(logits, labels)
            # auxiliary-loss extension hook: any module may
            # ``self.sow("losses", "spectre_loss", value)`` and it is summed
            # into the objective — the reference scanned modules for a
            # ``spectre_loss`` attribute that none defined
            # (vit_spectre_cifar100.py:291-295); here the hook is live.
            aux = sum((jnp.sum(leaf) for leaf in
                       jax.tree.leaves(mutated.get("losses", {}))), jnp.float32(0))
            return loss + aux, (logits, aux)

        (loss, (logits, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        metrics = {"loss": loss, "accuracy": _accuracy(logits, labels),
                   "loss_aux": aux}
        return grads, metrics

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray):
        step_rng = jax.random.fold_in(state.rng, state.step)
        if fast_rng:
            step_rng = _fast_key(step_rng)
        if grad_accum_steps <= 1:
            grads, metrics = compute(state, step_rng, images, labels)
        else:
            a = grad_accum_steps
            if images.shape[0] % a:
                raise ValueError(
                    f"batch {images.shape[0]} not divisible by "
                    f"grad_accum_steps={a} — samples would be silently dropped")
            mb = images.shape[0] // a
            im = images[: a * mb].reshape(a, mb, *images.shape[1:])
            lb = labels[: a * mb].reshape(a, mb, *labels.shape[1:])
            rngs = jax.random.split(step_rng, a)

            def body(carry, xs):
                g_acc, m_acc = carry
                rng, x, y = xs
                g, m = compute(state, rng, x, y)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                m_acc = jax.tree.map(jnp.add, m_acc, m)
                return (g_acc, m_acc), None

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            m0 = {"loss": jnp.float32(0), "accuracy": jnp.float32(0),
                  "loss_aux": jnp.float32(0)}
            (grads, metrics), _ = jax.lax.scan(body, (g0, m0), (rngs, im, lb))
            grads = jax.tree.map(lambda v: v / a, grads)
            metrics = jax.tree.map(lambda v: v / a, metrics)

        new_state = state.apply_gradients(grads, state.rng)
        return new_state, metrics

    return train_step


def make_eval_step(model) -> Callable:
    """Eval step over a possibly-padded batch: ``mask`` flags the real
    examples per sample (the pipeline pads the final batch to keep shapes
    static; a per-sample mask — not a scalar count — stays correct when the
    global batch is assembled from per-process slices on multi-host);
    returns sums so the caller aggregates exact epoch metrics."""

    @jax.jit
    def eval_step(params, buffers, images, labels, mask):
        logits = model.apply({"params": params, "buffers": buffers}, images)
        per_ex = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        correct = jnp.sum((jnp.argmax(logits, axis=-1) == labels) & mask)
        return {
            "loss_sum": jnp.sum(per_ex * mask),
            "correct": correct,
            "count": jnp.sum(mask.astype(jnp.int32)),
        }

    return eval_step


def make_distill_step(
    student,
    temperature: float = 2.0,
    kd_weight: float = 0.25,
    ce_weight: float = 0.75,
    fast_rng: bool = True,
) -> Callable:
    """Distillation train step (train.py:320-353 semantics).

    Takes the frozen teacher's logits as an input: the teacher forward runs
    in its own jitted program (distill/loop.py), which keeps the two
    compilations small and lets the teacher program be reused unchanged —
    both still execute back-to-back on the same chips with no host sync
    between them (dispatch is async).
    """

    @partial(jax.jit, donate_argnums=(0,))
    def distill_step(
        state: TrainState,
        images_student: jnp.ndarray,
        teacher_logits: jnp.ndarray,
        labels: jnp.ndarray,
    ):
        step_rng = jax.random.fold_in(state.rng, state.step)
        if fast_rng:
            step_rng = _fast_key(step_rng)
        teacher_logits = jax.lax.stop_gradient(teacher_logits)

        def loss_fn(params):
            logits = student.apply(
                {"params": params, "buffers": state.buffers},
                images_student,
                deterministic=False,
                rngs={"dropout": step_rng},
            )
            loss, parts = distill_loss(
                logits, teacher_logits, labels, temperature, kd_weight, ce_weight
            )
            return loss, (logits, parts)

        (loss, (logits, parts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, state.rng)
        metrics = {"loss": loss, "accuracy": _accuracy(logits, labels), **parts}
        return new_state, metrics

    return distill_step
