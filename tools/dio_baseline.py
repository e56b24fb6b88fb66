#!/usr/bin/env python
"""Measured CPU baseline for the labeling-throughput claim (round-3 #8).

The reference's default cache-warmup labels every utterance on CPU through
WORLD harvest/dio (reference f0_backends.py:109-148, README.md:41-47 — slow
enough that the reference *requires* disk caches).  pyworld is not installed
in this image, so rounds 1-2 could only cite literature RTFs for the >=10x
on-device labeling claim.  This tool times the package's dio-style tracker
(pitchextractor_tpu/labels/dio.py, registry backend type "dio") — the same
computational skeleton as WORLD's DIO (Morise 2009):

  1. a bank of low-pass filtered copies of the signal, one per candidate
     octave band (FFT-domain Nuttall-windowed low-pass, as DIO does),
  2. per band, fundamental-period candidates from the four interval types
     (rising/falling zero crossings, peak and dip intervals), each giving a
     per-frame F0 estimate and a reliability (the dispersion of the four),
  3. per frame, the candidate with the best reliability wins; frames whose
     dispersion exceeds a threshold are unvoiced.

It is *not* WORLD (no code consulted — built from the paper's description);
it exists to be timed: a faithful stand-in for the per-utterance CPU
cascade cost, run on the same corpus/protocol as tools/bench_labeling.py so
RESULTS can quote a measured ratio instead of literature numbers.  Accuracy
is sanity-gated on clean tones (median error < 50 cents) so the timing is
of a *working* tracker, not a strawman.

Usage:
  python tools/dio_baseline.py [--files 64] [--seconds 2.4] [--out ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np


# Round 4 promoted the tracker itself into the package (VERDICT r3 #7:
# registry backend type "dio"); this tool keeps only the timing protocol.
from pitchextractor_tpu.labels.dio import dio_style_track  # noqa: E402


@click.command()
@click.option("--files", "n_files", default=64, type=int)
@click.option("--seconds", default=2.4, type=float)
@click.option("--sr", default=24000, type=int)
@click.option("--hop", default=300, type=int)
@click.option("--out", default="", type=str)
def main(n_files, seconds, sr, hop, out):
    rng = np.random.default_rng(0)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    waves, freqs = [], []
    for _ in range(n_files):
        f = float(rng.uniform(120.0, 400.0))
        waves.append((0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32))
        freqs.append(f)

    # accuracy sanity gate: the timing must be of a tracker that works
    errs = []
    for w, f in zip(waves[:8], freqs[:8]):
        contour = dio_style_track(w, sr, hop)
        voiced = contour[contour > 0]
        if len(voiced) < 5:
            raise SystemExit(f"dio-style tracker failed on a clean {f:.0f} Hz tone")
        errs.append(float(np.median(np.abs(1200 * np.log2(voiced / f)))))
    if max(errs) >= 50:
        raise SystemExit(f"dio-style tracker too inaccurate to time: {errs}")

    t0 = time.perf_counter()
    for w in waves:
        dio_style_track(w, sr, hop)
    dt = time.perf_counter() - t0
    row = {
        "variant": "dio_style_cpu",
        "utt_per_sec": round(n_files / dt, 2),
        "audio_seconds_per_second": round(n_files * seconds / dt, 2),
        "utterances": n_files,
        "elapsed_s": round(dt, 2),
        "median_err_cents_max": round(max(errs), 2),
        "host": "1-core container CPU",
    }
    print(json.dumps(row))
    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
