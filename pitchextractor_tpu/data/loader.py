"""Data loader: multi-threaded prefetching batch iterator with per-host
sharding hooks.

Replaces the reference's ``torch.utils.data.DataLoader`` with worker
*processes* (meldataset.py:829-875).  On TPU hosts the heavy per-item work
(FFT/mel, cache reads) is numpy/BLAS code that releases the GIL, and the
accelerator-bound labeling runs as batched JAX dispatches in the main
process — so a thread pool with a bounded prefetch queue gives pipelined
input without pickling/fork hazards (the reference needed a ``spawn``
context workaround for CUDA-in-worker crashes; that class of failure does
not exist here).

Multi-host layout: pass ``shard_index``/``shard_count`` (defaults taken from
``jax.process_index()/process_count()``) and each host iterates a disjoint
slice of the dataset — the host-side input sharding layer called for in
SURVEY.md §2.11.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from .collate import Collater
from .dataset import MelDataset


class DataLoader:
    """Iterable over collated batches; one shuffle per epoch."""

    def __init__(
        self,
        dataset: MelDataset,
        batch_size: int = 4,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 1,
        collate_fn: Optional[Collater] = None,
        seed: int = 0,
        prefetch_factor: int = 2,
        shard_index: int = 0,
        shard_count: int = 1,
    ) -> None:
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, int(num_workers))
        self.collate_fn = collate_fn or Collater()
        self.rng = np.random.default_rng(seed)
        self.prefetch_factor = max(1, int(prefetch_factor))
        self.shard_index = int(shard_index)
        self.shard_count = max(1, int(shard_count))
        self._epoch = 0

    def _epoch_indices(self) -> np.ndarray:
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            # same permutation on every host, then shard — keeps global
            # coverage disjoint across processes
            epoch_rng = np.random.default_rng(
                np.random.SeedSequence([self._epoch, 0x5EED])
            ) if self.shuffle and self.shard_count > 1 else self.rng
            epoch_rng.shuffle(indices)
        indices = indices[self.shard_index :: self.shard_count]
        return indices

    def __len__(self) -> int:
        n = len(self.dataset) // self.shard_count if self.shard_count > 1 else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        self._epoch += 1
        indices = self._epoch_indices()
        n = len(indices)
        batch_starts = range(0, n - self.batch_size + 1 if self.drop_last else n, self.batch_size)
        batches = [indices[s : s + self.batch_size] for s in batch_starts]
        if not batches:
            return iter(())

        if self.num_workers <= 0:
            def _serial():
                for batch_idx in batches:
                    items = [self.dataset[int(i)] for i in batch_idx]
                    yield self.collate_fn(items)
            return _serial()
        return self._parallel_iter(batches)

    def _parallel_iter(self, batches):
        out_queues = [queue.Queue(maxsize=self.prefetch_factor) for _ in range(len(batches))]
        stop = threading.Event()
        task_iter = iter(list(enumerate(batches)))
        lock = threading.Lock()

        def worker():
            while not stop.is_set():
                with lock:
                    task = next(task_iter, None)
                if task is None:
                    return
                slot, batch_idx = task
                try:
                    items = [self.dataset[int(i)] for i in batch_idx]
                    out_queues[slot].put(("ok", self.collate_fn(items)))
                except Exception as exc:  # propagate to the consumer
                    out_queues[slot].put(("err", exc))
                    return

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(min(self.num_workers, len(batches)))
        ]
        for t in threads:
            t.start()

        def _consume():
            try:
                for slot in range(len(batches)):
                    status, payload = out_queues[slot].get()
                    if status == "err":
                        raise payload
                    yield payload
            finally:
                stop.set()

        return _consume()


def build_dataloader(
    path_list,
    validation: bool = False,
    batch_size: int = 4,
    num_workers: int = 1,
    device: str = "tpu",
    collate_config: Optional[dict] = None,
    dataset_config: Optional[dict] = None,
    shard_index: Optional[int] = None,
    shard_count: Optional[int] = None,
) -> DataLoader:
    """Public loader factory (reference meldataset.py:829-875).

    ``device`` is accepted for signature compatibility; batches are plain
    numpy and placed on device by the jitted training step.
    """
    dataset_config = dict(dataset_config or {})
    dataloader_options = dataset_config.pop("dataloader", {}) or {}
    dataset_config.pop("sr", None)

    dataset = MelDataset(path_list, validation=validation, **dataset_config)
    collate_fn = Collater(**(collate_config or {}))

    if shard_index is None or shard_count is None:
        try:
            import jax

            shard_index = jax.process_index()
            shard_count = jax.process_count()
        except Exception:
            shard_index, shard_count = 0, 1

    prefetch_factor = dataloader_options.get("prefetch_factor")
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=(not validation),
        drop_last=(not validation),
        num_workers=num_workers,
        collate_fn=collate_fn,
        prefetch_factor=int(prefetch_factor) if prefetch_factor else 2,
        shard_index=shard_index,
        shard_count=shard_count,
    )
    return loader
