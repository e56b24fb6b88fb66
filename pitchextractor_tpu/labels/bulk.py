"""Bulk on-device F0 labeling over a dataset's file list.

Replaces the reference's per-file warm-up labeling (train.py:127-133 iterates
the DataLoader so each CPU worker labels one utterance at a time through the
cascade).  Here cache misses are collected, bucketed by padded length (one
compiled tracker shape per bucket), labeled in dense batches on the
accelerator, and written into the standard ``_f0{chain}.npy``/``.json``
caches — the same files the per-item path would produce.

Used by the training CLI's warm-up pass and ``tools/precompute_labels.py``.
"""

from __future__ import annotations

import time
from typing import Dict, List, Tuple

import numpy as np


def quantize_waveform_i16(batch: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] -> int16 at the 1/32768 decode scale (io/audio.py),
    so 16-bit-PCM-sourced samples survive the round trip exactly."""
    return np.clip(np.round(batch * 32768.0), -32768, 32767).astype(np.int16)


def _pipelined_contours(extractor, host_batches, sr: int, transfer_dtype: str):
    """Three-stage upload/compute/fetch pipeline over the device path.

    Yields ``(chunk, contours)`` like the serial path, but with the
    host->device copy of batch i+1 submitted on a worker thread while
    batch i's tracker program runs and batch i-1's result downloads.
    """
    from concurrent.futures import ThreadPoolExecutor

    import jax

    def _place(batch: np.ndarray):
        if transfer_dtype == "int16":
            return jax.device_put(quantize_waveform_i16(batch))
        return jax.device_put(batch)

    def _fetch(chunk, batch, dev):
        contours = np.asarray(dev, dtype=np.float64)
        # rare bad rows fall through the per-utterance cascade on host
        contours = extractor.apply_batch_fallback(contours, batch, sr)
        return chunk, contours

    it = iter(host_batches)
    try:
        chunk, batch = next(it)
    except StopIteration:
        return
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(_place, batch)
        prev = None  # (chunk, batch, device_result)
        for nxt_chunk, nxt_batch in it:
            placed = fut.result()
            fut = pool.submit(_place, nxt_batch)
            dev = extractor.compute_batch_device(placed, sr)  # async dispatch
            if prev is not None:
                yield _fetch(*prev)
            prev = (chunk, batch, dev)
            chunk, batch = nxt_chunk, nxt_batch
        dev = extractor.compute_batch_device(fut.result(), sr)
        if prev is not None:
            yield _fetch(*prev)
        yield _fetch(chunk, batch, dev)


def precompute_for_dataset(
    dataset,
    batch_size: int = 64,
    bucket_seconds: float = 1.0,
    force: bool = False,
    verbose: bool = True,
    transfer_dtype: str = "int16",
) -> Dict:
    """Fill every missing F0 cache for ``dataset`` (a MelDataset) in batched
    device dispatches.  Returns summary stats.

    When the primary backend supports the device path, batches ride a
    three-stage pipeline — host->device upload of batch i+1 on a worker
    thread, async compute dispatch of batch i, host fetch of batch i-1 —
    so the tunnel upload no longer serializes with tracker compute (the
    round-2 facade was upload-bound at 68-134 utt/s while the raw kernel
    did 970; the trainer's ``_prefetch_placed`` solved the same problem
    for training batches).  ``transfer_dtype="int16"`` halves the upload
    bytes (exact for 16-bit-PCM-decoded, unresampled waves — io/audio.py
    decodes s16 as k/32768); pass ``"float32"`` for byte-identical caches
    vs the serial path on arbitrary float input.
    """
    if transfer_dtype not in ("int16", "float32"):
        raise ValueError(f"transfer_dtype must be int16|float32, got {transfer_dtype!r}")

    from ..dsp.resample import resample_np
    from ..io import read_audio
    from ..io.audio import AudioDecodeError

    extractor = dataset.f0_extractor
    sr = dataset.sr
    hop = dataset.mel_params["hop_length"]
    bucket = max(int(bucket_seconds * sr), hop)

    missing: List[str] = []
    skipped_cached = 0
    failed: List[Tuple[str, str]] = []
    for path in dataset.data_list:
        if not force and dataset._load_cached_f0(path) is not None:
            skipped_cached += 1
        else:
            missing.append(path)

    def _read_host(path: str) -> np.ndarray:
        wave, wsr = read_audio(path)
        if wave.ndim > 1:
            wave = np.mean(wave, axis=-1)
        wave = wave.astype(np.float32)
        if wsr != sr:
            wave = resample_np(wave, wsr, sr)
        return wave

    # decode+downmix+resample pipelined on native C++ threads when the
    # pexio pool is available (native/pexio.cpp); host fallback otherwise
    pool = None
    if missing:
        try:
            from ..io.native import NativePrefetchPool, native_info
            import os as _os

            pool = NativePrefetchPool(n_threads=min(8, _os.cpu_count() or 1))
        except (RuntimeError, ImportError):
            pool = None

    # collect work items: (path, waveform, true_frames)
    pending: List[Tuple[str, np.ndarray, int]] = []
    jobs: List[Tuple[str, int]] = []
    if pool is not None:
        for path in missing:
            info = native_info(path)
            try:
                jobs.append(
                    (path, pool.submit(path, target_sr=sr, orig_sr=info[1] if info else None))
                )
            except RuntimeError as exc:
                failed.append((path, str(exc)))
    try:
        if pool is not None:
            for path, job in jobs:
                try:
                    wave, _ = pool.wait(job)
                except OSError:
                    try:
                        wave = _read_host(path)  # numpy codec is more lenient
                    except (AudioDecodeError, OSError) as exc:
                        failed.append((path, str(exc)))
                        continue
                pending.append((path, wave, 1 + len(wave) // hop))
        else:
            for path in missing:
                try:
                    wave = _read_host(path)
                except (AudioDecodeError, OSError) as exc:
                    failed.append((path, str(exc)))
                    continue
                pending.append((path, wave, 1 + len(wave) // hop))
    finally:
        if pool is not None:
            pool.close()

    # bucket by padded length so each bucket is one compiled shape
    buckets: Dict[int, List] = {}
    for item in pending:
        padded = ((len(item[1]) + bucket - 1) // bucket) * bucket
        buckets.setdefault(padded, []).append(item)

    def _host_batches():
        for padded, items in sorted(buckets.items()):
            for i in range(0, len(items), batch_size):
                chunk = items[i : i + batch_size]
                batch = np.zeros((len(chunk), padded), dtype=np.float32)
                for j, (_, wave, _) in enumerate(chunk):
                    batch[j, : len(wave)] = wave
                yield chunk, batch

    t0 = time.time()
    written = 0
    total_audio_seconds = 0.0
    primary = extractor.backends[0].name
    pipelined = getattr(extractor, "supports_device_batch", False)
    if pipelined:
        results = _pipelined_contours(extractor, _host_batches(), sr, transfer_dtype)
    else:
        results = (
            (chunk, extractor.compute_batch(batch, sr))
            for chunk, batch in _host_batches()
        )
    for chunk, contours in results:
        for j, (path, wave, true_frames) in enumerate(chunk):
            f0 = contours[j][:true_frames].astype(np.float32)
            dataset._save_f0_cache(path, f0, primary)
            written += 1
            total_audio_seconds += len(wave) / sr
        if verbose:
            print(f"[precompute] {written}/{len(pending)} files labeled")
    elapsed = max(time.time() - t0, 1e-9)
    stats = {
        "written": written,
        "cached": skipped_cached,
        "failed": len(failed),
        "pipelined": bool(pipelined),
        "transfer_dtype": transfer_dtype if pipelined else "float32",
        "audio_seconds_per_second": total_audio_seconds / elapsed if written else 0.0,
        "files_per_second": written / elapsed if written else 0.0,
        "cache_identifier": extractor.cache_identifier,
        "elapsed_s": elapsed if written else 0.0,
    }
    if verbose:
        print(f"[precompute] {stats}")
        for path, reason in failed:
            print(f"[precompute] FAILED {path}: {reason}")
    return stats
