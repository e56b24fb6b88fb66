"""Profiling and step-time metering.

The reference has no tracing/profiling at all (SURVEY.md §5.1 — tqdm bars and
``cudnn.benchmark`` were the only perf machinery).  This module provides:

- ``trace(log_dir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-viewable trace of device execution;
- ``StepTimer``: wall-clock step statistics (mean/p50/p90, utterances/sec)
  with warm-up exclusion, used by the trainer and bench.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._items: List[int] = []
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def stop(self, items: int = 1) -> float:
        assert self._last is not None, "start() not called"
        dt = time.perf_counter() - self._last
        self._times.append(dt)
        self._items.append(items)
        self._last = None
        return dt

    @contextlib.contextmanager
    def step(self, items: int = 1):
        self.start()
        yield
        self.stop(items)

    def summary(self) -> dict:
        times = np.asarray(self._times[self.warmup :] or self._times)
        items = np.asarray(self._items[self.warmup :] or self._items)
        if times.size == 0:
            return {}
        return {
            "steps": int(times.size),
            "mean_ms": float(1e3 * times.mean()),
            "p50_ms": float(1e3 * np.percentile(times, 50)),
            "p90_ms": float(1e3 * np.percentile(times, 90)),
            "items_per_sec": float(items.sum() / times.sum()),
        }
