"""Multi-host initialisation.

No reference counterpart (single process, SURVEY.md §2.11).  On a TPU pod
each host process calls ``initialize()`` once before building the mesh;
``jax.distributed`` wires the hosts over DCN while all tensor collectives
ride ICI.  On a single host this is a no-op, so the same training script runs
unchanged from one chip to a full slice.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise jax.distributed when running multi-process.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU pods jax can usually infer
    everything and plain ``jax.distributed.initialize()`` suffices.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _env_int("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")

    if num_processes in (None, 1) and coordinator_address is None:
        logger.info("Single-process run; skipping jax.distributed init.")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialised: process %d/%d",
        jax.process_index(),
        jax.process_count(),
    )


def _env_int(name: str):
    value = os.environ.get(name)
    return int(value) if value else None
