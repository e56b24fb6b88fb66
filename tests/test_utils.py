"""Aux subsystem tests: step timer, summary writer, distributed no-op,
compilation cache, thread-local RNG."""

import json
import os
import time

import numpy as np


def test_step_timer():
    from pitchextractor_tpu.utils.profiler import StepTimer

    timer = StepTimer(warmup=1)
    for _ in range(4):
        with timer.step(items=8):
            time.sleep(0.01)
    s = timer.summary()
    assert s["steps"] == 3  # warmup excluded
    assert s["mean_ms"] >= 10
    assert s["items_per_sec"] > 0


def test_summary_writer_tb_or_jsonl(tmp_path):
    from pitchextractor_tpu.utils.summary import SummaryWriter

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, 1)
    w.add_scalar("train/loss", 1.2, 2)
    w.close()
    entries = os.listdir(tmp_path)
    assert entries  # events file or scalars.jsonl


def test_distributed_single_process_noop():
    from pitchextractor_tpu.parallel.distributed import initialize

    initialize()  # must not raise without coordinator env


def test_compilation_cache_enable(tmp_path, monkeypatch):
    from pitchextractor_tpu.utils.compilation_cache import enable_compilation_cache

    monkeypatch.delenv("PEX_DISABLE_COMPILATION_CACHE", raising=False)
    assert enable_compilation_cache(str(tmp_path / "cache")) is True
    monkeypatch.setenv("PEX_DISABLE_COMPILATION_CACHE", "1")
    assert enable_compilation_cache(str(tmp_path / "cache2")) is False


def test_thread_local_rng_threads_and_pickle():
    import pickle
    import threading

    from pitchextractor_tpu.data.dataset import ThreadLocalRNG

    rng = ThreadLocalRNG(seed=7)
    results = {}

    def worker(tid):
        results[tid] = [float(rng.random()) for _ in range(100)]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    # streams independent (overwhelmingly unlikely to collide)
    assert results[0] != results[1]

    rng2 = pickle.loads(pickle.dumps(rng))
    assert 0 <= rng2.random() < 1
    assert isinstance(rng2.integers(0, 10), (int, np.integer))
