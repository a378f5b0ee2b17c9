"""Tensor parallelism via GSPMD sharding rules.

The models here are small enough that data parallelism is the primary axis
(SURVEY.md §2.3), but the framework supports Megatron-style TP for scaling
the wide projections: params are annotated with NamedShardings over the
``model`` mesh axis and XLA's SPMD partitioner derives the partitioned
matmuls and the all-reduces (over ICI) automatically — no hand-written
collectives.

Sharding layout (rules keyed on flax param paths):
- ViT encoder MLP:    linear1 kernel column-sharded [E, H/model], gelu local,
                      linear2 kernel row-sharded [H/model, E] -> psum.
- Attention:          q/k/v head axis sharded, out-proj head axis sharded ->
                      psum. (flax MHDPA param layout [E, heads, head_dim].)
- SpectreViT mixer:   the E*H -> E projection kernel row-sharded on the
                      contracting dim (mix heads live on different shards) ->
                      psum before the LayerNorm epilogue.
Everything else is replicated.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectre_tpu.parallel.mesh import MODEL_AXIS

# (param-path regex, PartitionSpec). First match wins; default replicated.
VIT_TP_RULES = (
    (r"encoder_\d+/linear1/kernel$", P(None, MODEL_AXIS)),
    (r"encoder_\d+/linear1/bias$", P(MODEL_AXIS)),
    (r"encoder_\d+/linear2/kernel$", P(MODEL_AXIS, None)),
    (r"self_attn/mhsa/(query|key|value)/kernel$", P(None, MODEL_AXIS, None)),
    (r"self_attn/mhsa/(query|key|value)/bias$", P(MODEL_AXIS, None)),
    (r"self_attn/mhsa/out/kernel$", P(MODEL_AXIS, None, None)),
)

SPECTRE_TP_RULES = (
    # mixer projection contracts over E*H: row-shard the kernel so each model
    # shard projects its local heads, psum'd before the LN epilogue
    (r"mix_layer/linear/kernel$", P(MODEL_AXIS, None)),
    # the wide FF hidden dim
    (r"linear1/kernel$", P(None, MODEL_AXIS)),
    (r"linear1/(bias|ln_scale|ln_bias)$", P(MODEL_AXIS)),
    (r"linear3/kernel$", P(MODEL_AXIS, None)),
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def tp_shardings(params, mesh: Mesh, rules):
    """Pytree of NamedShardings for ``params``: rule-matched leaves shard over
    the model axis, everything else replicates. Leaves whose matched axis size
    doesn't divide the mesh's model dim fall back to replicated."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape))[MODEL_AXIS]

    def spec_for(path, leaf):
        s = _path_str(path)
        for pattern, spec in rules:
            if re.search(pattern, s):
                ok = True
                for dim, name in enumerate(spec):
                    if name == MODEL_AXIS and leaf.shape[dim] % model_size:
                        ok = False
                if ok:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def apply_tp(state, mesh: Mesh, rules):
    """Place a TrainState on the mesh with TP param shardings.

    Buffers/step/rng replicate. Optimizer moments start replicated and are
    resharded by GSPMD on the first update (the jitted step's output
    shardings propagate from the param shardings), so no optax-internal
    structure knowledge is needed here.
    """
    param_sh = tp_shardings(state.params, mesh, rules)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    return state.replace(
        params=jax.tree.map(jax.device_put, state.params, param_sh))
