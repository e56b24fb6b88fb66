"""Persistent XLA compilation cache.

First-time compiles of the training step / tracker take tens of seconds on
TPU (minutes through remote-compile tunnels); enabling jax's persistent cache
makes every subsequent process start warm.  Called by the CLIs and bench.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/pitchextractor_tpu/xla")


def enable_compilation_cache(path: str = DEFAULT_CACHE_DIR) -> bool:
    if os.environ.get("PEX_DISABLE_COMPILATION_CACHE"):
        return False
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception as exc:  # pragma: no cover - best effort
        logger.debug("compilation cache unavailable: %s", exc)
        return False
