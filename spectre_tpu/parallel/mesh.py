"""Device-mesh and sharding layer — the framework's distributed backbone.

The reference has no distributed machinery at all (SURVEY.md §2.3: no DDP, no
NCCL, single `model.to(device)` at train.py:41,59). The TPU-native design makes
data parallelism over ICI a first-class component instead: a `jax.sharding.Mesh`
with a ``data`` axis (and an optional ``model`` axis reserved for tensor
parallelism of the wide FF projections), batch sharded over ``data``, params
replicated. XLA inserts the gradient all-reduce (`psum` over ICI) from the
sharding annotations — there is no hand-written collective in the hot path.

Multi-host scaling: `jax.distributed.initialize()` + the same mesh spanning all
processes; the data axis then covers the DCN boundary transparently. Sequence
parallelism is intrinsically out of scope for this model family (seq <= 65 and
MHPermutMix mixes across the flattened [N*E] vector — sharding the sequence
would turn the fixed permutations into all-to-alls; SURVEY.md §5.7).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    devices: list | None = None,
    data_parallel: int | None = None,
    model_parallel: int = 1,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    Defaults to pure data parallelism over every visible device. On a real
    v5e slice the device order from ``jax.devices()`` already follows the ICI
    torus, so a 1-D data axis rides ICI links.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    if data_parallel is None:
        data_parallel = len(devs) // model_parallel
    devs = devs[: data_parallel * model_parallel].reshape(data_parallel, model_parallel)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-side batch (pytree of arrays, leading axis = batch) onto
    the mesh, sharded over the data axis. The H2D transfer happens here —
    once per step, overlapped by the pipeline's prefetch (data/pipeline.py)."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
