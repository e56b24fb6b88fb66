"""Device mesh and sharding helpers.

This layer has no reference counterpart — the reference trains on exactly one
device (SURVEY.md §2.11) — so it is new TPU-first design: a 2-D
``(data, model)`` mesh over ICI, batch tensors sharded on ``data``, parameters
replicated (optionally sharded on ``model`` for the wide sequence-head
matmuls).  All cross-device communication is XLA collectives inserted by the
partitioner; at this model scale (~10-40 M params) gradient all-reduce over
the data axis is the only collective on the training critical path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence] = None,
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh shape ({data_parallel}, {model_parallel}) != device count {n}"
        )
    grid = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host numpy batches on the mesh, sharded along axis 0."""
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]
