#!/usr/bin/env python
"""Bulk F0 label generation: batch utterances onto the accelerator and write
the standard ``_f0{chain}.npy``/``.json`` caches.

Replaces the reference's cache warm-up pass (train.py:127-133), where every
file is labeled one at a time inside CPU DataLoader workers.  Here files are
bucketed by padded length and labeled in dense batches through the
TPU-resident tracker (one jitted dispatch per bucket shape), then each
contour is trimmed to the file's true frame count before caching.

Usage:
  python tools/precompute_labels.py --list Data/train_list.txt \
      --config ./Configs/config.yml [--batch_size 64] [--force]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np


def precompute(
    list_path: str,
    config_path: str = "./Configs/config.yml",
    batch_size: int = 64,
    bucket_seconds: float = 1.0,
    force: bool = False,
    verbose: bool = True,
) -> dict:
    from pitchextractor_tpu import config as config_lib
    from pitchextractor_tpu.data.dataset import MelDataset
    from pitchextractor_tpu.dsp.resample import resample_np
    from pitchextractor_tpu.io import read_audio
    from pitchextractor_tpu.io.audio import AudioDecodeError

    config = {}
    if os.path.isfile(config_path):
        config = config_lib.resolve(config_lib.load_config(config_path))
    dataset_params = config.get("dataset_params", {})

    with open(list_path, "r", encoding="utf-8") as fh:
        lines = fh.readlines()

    dataset = MelDataset(
        lines,
        mel_params=dataset_params.get("mel_params"),
        f0_params=dataset_params.get("f0_params"),
        verbose=False,
    )
    extractor = dataset.f0_extractor
    sr = dataset.sr
    hop = dataset.mel_params["hop_length"]
    bucket = max(int(bucket_seconds * sr), hop)

    # collect work items: (path, waveform, true_frames)
    pending = []
    skipped_cached = 0
    failed = []
    for path in dataset.data_list:
        if not force and dataset._load_cached_f0(path) is not None:
            skipped_cached += 1
            continue
        try:
            wave, wsr = read_audio(path)
        except (AudioDecodeError, OSError) as exc:
            failed.append((path, str(exc)))
            continue
        if wave.ndim > 1:
            wave = np.mean(wave, axis=-1)
        wave = wave.astype(np.float32)
        if wsr != sr:
            wave = resample_np(wave, wsr, sr)
        pending.append((path, wave, 1 + len(wave) // hop))

    # bucket by padded length so each bucket is one compiled shape
    buckets: dict = {}
    for item in pending:
        padded = ((len(item[1]) + bucket - 1) // bucket) * bucket
        buckets.setdefault(padded, []).append(item)

    t0 = time.time()
    written = 0
    total_audio_seconds = 0.0
    for padded, items in sorted(buckets.items()):
        for i in range(0, len(items), batch_size):
            chunk = items[i : i + batch_size]
            batch = np.zeros((len(chunk), padded), dtype=np.float32)
            for j, (_, wave, _) in enumerate(chunk):
                batch[j, : len(wave)] = wave
            contours = extractor.compute_batch(batch, sr)
            primary = extractor.backends[0].name
            for j, (path, wave, true_frames) in enumerate(chunk):
                f0 = contours[j][:true_frames].astype(np.float32)
                dataset._save_f0_cache(path, f0, primary)
                written += 1
                total_audio_seconds += len(wave) / sr
            if verbose:
                print(
                    f"[precompute] bucket {padded / sr:.1f}s: "
                    f"{min(i + batch_size, len(items))}/{len(items)} files"
                )
    elapsed = max(time.time() - t0, 1e-9)
    stats = {
        "written": written,
        "cached": skipped_cached,
        "failed": len(failed),
        "audio_seconds_per_second": total_audio_seconds / elapsed if written else 0.0,
        "files_per_second": written / elapsed if written else 0.0,
        "cache_identifier": extractor.cache_identifier,
    }
    if verbose:
        print(f"[precompute] {stats}")
        for path, reason in failed:
            print(f"[precompute] FAILED {path}: {reason}")
    return stats


@click.command()
@click.option("--list", "list_path", required=True, type=str)
@click.option("--config", "config_path", default="./Configs/config.yml", type=str)
@click.option("--batch_size", default=64, type=int)
@click.option("--bucket_seconds", default=1.0, type=float)
@click.option("--force", is_flag=True, default=False)
def main(list_path, config_path, batch_size, bucket_seconds, force):
    precompute(list_path, config_path, batch_size, bucket_seconds, force)


if __name__ == "__main__":
    main()
