#!/usr/bin/env python
"""Bulk-labeling throughput bench (round-3 leg: pipelined facade).

Round 2 measured the labeling *facade* at 68-134 utt/s regardless of backend
— upload-bound through the tunnel — while the raw jax_ac kernel did 970
utt/s (RESULTS.md leg 7).  This bench measures the round-3 fix:

1. ``facade_serial``   — the old path: one blocking ``compute_batch`` per
                         batch (fresh f32 host upload each call).
2. ``pipeline_f32``    — upload/compute/fetch overlap, float32 wire.
3. ``pipeline_int16``  — same with int16 waves (half the wire bytes).
4. ``e2e_precompute``  — the shipped `pitchextractor-label` path end-to-end
                         on a generated WAV corpus (decode pool + pipeline +
                         cache writes), files/s.

Usage:
  python tools/bench_labeling.py [--batch_size 64] [--batches 40]
      [--seconds 2.4] [--corpus_files 2048] [--out results/...json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np


def _make_waves(rng, batch_size, n_batches, seconds, sr):
    n = int(seconds * sr)
    batches = []
    for _ in range(n_batches):
        f = rng.uniform(120.0, 400.0, size=(batch_size, 1))
        t = np.arange(n)[None, :] / sr
        phase = 2 * np.pi * f * t + rng.uniform(0, 2 * np.pi, (batch_size, 1))
        batches.append((0.4 * np.sin(phase)).astype(np.float32))
    return batches


@click.command()
@click.option("--batch_size", default=64, type=int)
@click.option("--batches", default=40, type=int)
@click.option("--seconds", default=2.4, type=float)
@click.option("--warmup", default=3, type=int)
@click.option("--corpus_files", default=2048, type=int)
@click.option("--corpus_dir", default="/tmp/labelbench_corpus", type=str)
@click.option("--out", default="", type=str)
@click.option("--skip_e2e", is_flag=True, default=False)
def main(batch_size, batches, seconds, warmup, corpus_files, corpus_dir, out, skip_e2e):
    from pitchextractor_tpu.labels import build_f0_extractor
    from pitchextractor_tpu.labels.bulk import _pipelined_contours
    from pitchextractor_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    sr, hop = 24000, 300
    extractor = build_f0_extractor(sr, hop, {"backend_order": ["jax_ac"]})
    rng = np.random.default_rng(0)
    pool = _make_waves(rng, batch_size, max(batches, warmup), seconds, sr)
    rows = []

    # warm the compile cache on every measured path (f32 + int16 dequant)
    for b in pool[:warmup]:
        extractor.compute_batch(b, sr)
    for _ in _pipelined_contours(extractor, [(None, pool[0])], sr, "int16"):
        pass

    def _measure(name, fn):
        t0 = time.perf_counter()
        count = fn()
        dt = time.perf_counter() - t0
        rate = count / dt
        rows.append({"variant": name, "utt_per_sec": round(rate, 1),
                     "utterances": count, "elapsed_s": round(dt, 2)})
        print(json.dumps(rows[-1]))

    def _serial():
        n = 0
        for b in pool[:batches]:
            extractor.compute_batch(b, sr)
            n += b.shape[0]
        return n

    _measure("facade_serial", _serial)

    for dtype in ("float32", "int16"):
        def _piped(dtype=dtype):
            n = 0
            feed = ((None, b) for b in pool[:batches])
            for _chunk, contours in _pipelined_contours(extractor, feed, sr, dtype):
                n += contours.shape[0]
            return n

        _measure(f"pipeline_{dtype}", _piped)

    if not skip_e2e:
        from pitchextractor_tpu.io import write_wav
        from pitchextractor_tpu.labels.cli import precompute

        os.makedirs(corpus_dir, exist_ok=True)
        list_path = os.path.join(corpus_dir, "list.txt")
        n = int(seconds * sr)
        t = np.arange(n) / sr
        with open(list_path, "w") as fh:
            for i in range(corpus_files):
                p = os.path.join(corpus_dir, f"u{i:05d}.wav")
                if not os.path.isfile(p):
                    f = 120.0 + (i % 64) * 4.0
                    write_wav(p, (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32), sr)
                fh.write(p + "|x\n")
        stats = precompute(list_path, config_path="/nonexistent.yml",
                           batch_size=batch_size, force=True, verbose=False)
        rows.append({"variant": "e2e_precompute",
                     "utt_per_sec": round(stats["files_per_second"], 1),
                     "utterances": stats["written"],
                     "elapsed_s": round(stats["elapsed_s"], 2),
                     "pipelined": stats["pipelined"],
                     "transfer_dtype": stats["transfer_dtype"]})
        print(json.dumps(rows[-1]))

    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
