"""Fully-sharded data parallelism (ZeRO-3) via GSPMD shardings.

Pure DP replicates params + optimizer moments on every chip; at scale the
optimizer state (2x params in f32 for AdamW) caps the model size per chip
long before activations do. FSDP shards each parameter — and its AdamW
moments — over the ``data`` mesh axis and lets XLA's SPMD partitioner derive
the collectives from the annotations alone (the scaling-book recipe): an
all-gather of each weight right before its matmul in the forward/backward,
and a reduce-scatter of the gradients so every chip updates only its own
parameter shard. No hand-written collective appears anywhere; the train
step is the same function `train/step.py` builds for DP, re-jitted with the
carried state's shardings pinned (`pin_step_shardings`) so the layout is
stable across steps.

Sharding choice per leaf: the LARGEST axis divisible by the data-axis size
is sharded (``P(..., "data", ...)``); leaves smaller than ``min_size``
elements replicate — for tiny tensors (LN scales, biases) the all-gather
latency costs more than the memory saved. On a ("data", "model") mesh the
layout composes with tensor parallelism: TP rules claim their axis first
(over ``model``), FSDP then shards the largest still-unsharded axis over
``data`` — the standard 2-D FSDPxTP layout.

Multi-host: the same annotations work when the data axis spans processes.
``device_put`` cannot place a host value on a non-fully-addressable
sharding, so `_put` builds the global arrays via
``jax.make_array_from_callback`` — every process holds an identical
replicated host copy (seeded init or an orbax restore template) and slices
out its own shards (tests/test_multihost.py, the ``--fsdp`` worker leg).

The reference has no distributed machinery at all (SURVEY.md §2.3 — single
``model.to(device)``, /root/reference/spectre_vit/repl/train.py:41,59); this
module is TPU-native capability the reference never had, validated by exact
f32 loss-equivalence against DP (tests/test_parallel_fsdp.py) and by the
driver's `dryrun_multichip` third leg.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectre_tpu.parallel.mesh import DATA_AXIS

# Leaves with fewer elements replicate: sharding a [512] bias saves ~2 KB/chip
# but adds an all-gather dispatch to the step — strictly worse on ICI.
MIN_SHARD_SIZE = 2 ** 14


def _with_data_axis(spec: P, shape, data_size: int, min_size: int) -> P:
    """Add DATA_AXIS on the largest unclaimed, divisible dim of ``shape``.

    ``spec`` may already carry TP axes (model-sharded dims keep their claim);
    returns ``spec`` unchanged when the leaf is too small or no dim divides.
    """
    if math.prod(shape) < min_size:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    candidates = [
        d for d, e in enumerate(entries)
        if e is None and shape[d] >= data_size and shape[d] % data_size == 0
    ]
    if not candidates:
        return spec
    d = max(candidates, key=lambda i: shape[i])
    entries[d] = DATA_AXIS
    return P(*entries)


def _put(x, sh: NamedSharding):
    """Place one leaf on ``sh``, including across processes.

    Single-process meshes take the cheap ``device_put``. When the mesh spans
    processes the sharding is not fully addressable and ``device_put`` of a
    host value is not allowed — but every process holds an identical
    replicated copy (seeded init / orbax template), so each host materializes
    its addressable shards by slicing that copy (`make_array_from_callback`).
    Typed PRNG keys round-trip through their raw key data (numpy cannot hold
    extended dtypes)."""
    if sh.is_fully_addressable:
        return jax.device_put(x, sh)
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        data = np.asarray(jax.random.key_data(x))
        arr = jax.make_array_from_callback(data.shape, sh,
                                           lambda idx: data[idx])
        return jax.random.wrap_key_data(arr)
    host = np.asarray(x)
    return jax.make_array_from_callback(host.shape, sh,
                                        lambda idx: host[idx])


def fsdp_shardings(params, mesh: Mesh, *, min_size: int = MIN_SHARD_SIZE,
                   tp_rules=None):
    """Pytree of NamedShardings: every large-enough leaf sharded over the
    data axis (largest divisible dim), composed with optional TP rules
    (TP claims its ``model``-axis dim first, FSDP shards a remaining dim)."""
    data_size = dict(zip(mesh.axis_names, mesh.devices.shape))[DATA_AXIS]
    if tp_rules is not None:
        from spectre_tpu.parallel.tp import tp_shardings

        base = tp_shardings(params, mesh, tp_rules)
    else:
        base = jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def spec_for(leaf, base_sh):
        return NamedSharding(
            mesh, _with_data_axis(base_sh.spec, leaf.shape, data_size, min_size))

    return jax.tree.map(spec_for, params, base)


def _place_like_params(node, params_treedef, param_sh, replicated):
    """Recursively place an optimizer-state tree: any sub-tree with exactly
    the params' structure (AdamW's mu/nu) adopts the param shardings; scalar
    leaves (step counts, schedule state) replicate. This shards the moments
    from step 0 — relying on GSPMD to reshard them on the first update would
    both waste a full replicated copy of 2x params and recompile the step
    when the carried state's shardings change between step 1 and step 2."""
    try:
        if jax.tree.structure(node) == params_treedef:
            return jax.tree.map(_put, node, param_sh)
    except Exception:
        pass
    if hasattr(node, "_fields"):  # optax NamedTuple states
        return type(node)(*(
            _place_like_params(getattr(node, f), params_treedef, param_sh,
                               replicated)
            for f in node._fields))
    if isinstance(node, (tuple, list)):
        return type(node)(
            _place_like_params(x, params_treedef, param_sh, replicated)
            for x in node)
    if isinstance(node, dict):
        return {k: _place_like_params(v, params_treedef, param_sh, replicated)
                for k, v in node.items()}
    return _put(node, replicated)


def pin_step_shardings(train_step, placed_state):
    """Re-jit a train step with the placed state's shardings pinned on the
    carried output.

    GSPMD's propagation chooses output shardings freely when unconstrained;
    measured here, it drifts most FSDP-sharded params back toward replicated
    on the first update — silently dropping ZeRO-3 after step 1 and
    recompiling when the carried state's shardings change. Pinning
    output == input shardings keeps the layout stable across every step and
    lets donation alias the state buffers exactly. The metrics subtree stays
    unconstrained (scalars). Works for any placed layout (FSDP, TP, DP) —
    the shardings are read off the state, not recomputed."""
    state_sh = jax.tree.map(lambda x: x.sharding, placed_state)
    return jax.jit(train_step, donate_argnums=(0,),
                   out_shardings=(state_sh, None))


def apply_fsdp(state, mesh: Mesh, *, min_size: int = MIN_SHARD_SIZE,
               tp_rules=None):
    """Place a TrainState on the mesh fully sharded: params AND AdamW moments
    sharded over ``data`` (optionally composed with TP rules over ``model``);
    buffers (permutation tables — read-only, gather-indexed) / step / rng
    replicate. The unchanged jitted train step then runs the ZeRO-3 schedule:
    GSPMD inserts the per-weight all-gathers and gradient reduce-scatters."""
    param_sh = fsdp_shardings(state.params, mesh, min_size=min_size,
                              tp_rules=tp_rules)
    replicated = NamedSharding(mesh, P())
    params = jax.tree.map(_put, state.params, param_sh)
    opt_state = _place_like_params(
        state.opt_state, jax.tree.structure(state.params), param_sh, replicated)
    rest = jax.tree.map(lambda x: _put(x, replicated),
                        state.replace(params=None, opt_state=None))
    return rest.replace(params=params, opt_state=opt_state)
