"""Parameter sharding rules for the (data, model) mesh.

At reference scale (~29M params) pure data parallelism is optimal
(SURVEY.md §2.11), but the layer exists as a first-class capability: large
2-D kernels (sequence-head input/recurrent projections, dense heads, the
wide 1x1 detector conv) shard column-wise over the ``model`` axis; everything
else (BN, biases, small convs) replicates.  XLA's partitioner inserts the
all-gathers/reduce-scatters; training code is unchanged.

Note: the Pallas LSTM kernel is not partitionable by the XLA sharding pass;
the Trainer falls back to the lax.scan recurrence whenever the model axis is
wider than 1.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def infer_param_shardings(params: Any, mesh: Mesh, min_size: int = 1 << 16):
    """Return a pytree of NamedSharding matching ``params``.

    Kernels whose last dim divides the model-axis width and whose size
    exceeds ``min_size`` are sharded P(..., 'model'); everything else is
    replicated.
    """
    model_size = mesh.shape[MODEL_AXIS]
    replicated = NamedSharding(mesh, P())

    def rule(leaf):
        if model_size <= 1:
            return replicated
        shape = getattr(leaf, "shape", ())
        if len(shape) < 2 or int(np.prod(shape)) < min_size:
            return replicated
        if shape[-1] % model_size != 0:
            return replicated
        spec = [None] * (len(shape) - 1) + [MODEL_AXIS]
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(rule, params)


def place_params(params: Any, shardings: Any):
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
