"""Test configuration.

Tests run on a simulated 8-device CPU mesh (SURVEY.md §4: multi-chip tests
runnable on CPU) — the env vars must be set before the first jax import.
"""

import os

import pytest
import sys

# Force CPU: the ambient environment may pin JAX_PLATFORMS to a real TPU
# tunnel; tests must run on the simulated host mesh regardless.
os.environ["JAX_PLATFORMS"] = os.environ.get("PEX_TEST_PLATFORM", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The environment's sitecustomize imports jax at interpreter start, latching
# JAX_PLATFORMS before this file runs — override via the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


@pytest.fixture(autouse=True)
def _reset_kernel_sharding_mesh():
    """Trainer installs the recurrence kernels' DP mesh process-globally
    (ops/lstm_pallas.set_sharding_mesh — one Trainer per process in
    production); tests construct many Trainers over different meshes, so
    clear it after every test or Pallas entry points shard over a stale
    mesh from an earlier test."""
    yield
    from pitchextractor_tpu.ops.lstm_pallas import set_sharding_mesh

    set_sharding_mesh(None)
