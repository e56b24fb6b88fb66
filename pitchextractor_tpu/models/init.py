"""Weight initializers with torch-parity semantics.

The reference initialises Linear layers with ``kaiming_uniform_`` (default
a=0, fan_in, leaky_relu gain -> bound sqrt(6/fan_in)), Conv2d with
``xavier_normal_``, and LSTM parameters with orthogonal (>=2-D) / standard
normal (1-D) (reference model.py:124-140).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn import initializers as ji

# torch nn.init.kaiming_uniform_(w) on a (out, in) Linear weight:
# bound = sqrt(6 / fan_in); flax Dense kernels are (in, out) with
# fan_in = first axis, which variance_scaling computes correctly.
kaiming_uniform = ji.variance_scaling(2.0, "fan_in", "uniform")

# torch nn.init.xavier_normal_: std = sqrt(2 / (fan_in + fan_out)).
xavier_normal = ji.glorot_normal()

orthogonal = ji.orthogonal()

zeros = ji.zeros


def normal_std1(key, shape, dtype=jnp.float32):
    """torch nn.init.normal_(p) default: N(0, 1) — used for LSTM biases."""
    return jax.random.normal(key, shape, dtype)
