#!/usr/bin/env python
"""Measured CPU baseline for the labeling-throughput claim (round-3 #8).

The reference's default cache-warmup labels every utterance on CPU through
WORLD harvest/dio (reference f0_backends.py:109-148, README.md:41-47 — slow
enough that the reference *requires* disk caches).  pyworld is not installed
in this image, so rounds 1-2 could only cite literature RTFs for the >=10x
on-device labeling claim.  This tool implements a dio-style tracker in
numpy — the same computational skeleton as WORLD's DIO (Morise 2009):

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


def _lowpass(x: np.ndarray, sr: int, cutoff: float) -> np.ndarray:
    """FFT-domain low-pass with a raised-cosine rolloff around the cutoff."""
    n = len(x)
    spec = np.fft.rfft(x)
    freqs = np.fft.rfftfreq(n, 1.0 / sr)
    gain = 0.5 * (1.0 + np.cos(np.pi * np.clip(freqs / max(cutoff, 1.0) - 0.5, 0.0, 1.0)))
    gain[freqs <= 0.5 * cutoff] = 1.0
    gain[freqs >= 1.5 * cutoff] = 0.0
    return np.fft.irfft(spec * gain, n)


def _interval_f0(positions: np.ndarray, times: np.ndarray, frame_times: np.ndarray):
    """Per-frame F0 from successive event positions (one interval type)."""
    if len(positions) < 2:
        return np.zeros_like(frame_times)
    t = times[positions]
    f = 1.0 / np.maximum(np.diff(t), 1e-6)
    centers = 0.5 * (t[:-1] + t[1:])
    return np.interp(frame_times, centers, f, left=0.0, right=0.0)


def dio_style_track(
    x: np.ndarray,
    sr: int,
    hop: int,
    fmin: float = 40.0,
    fmax: float = 800.0,
    bands_per_octave: int = 2,
    reliability_threshold: float = 0.12,
) -> np.ndarray:
    """Single-utterance dio-style F0 contour (CPU, numpy)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    T = 1 + n // hop
    frame_times = np.arange(T) * hop / sr
    times = np.arange(n) / sr

    n_bands = max(1, int(np.ceil(np.log2(fmax / fmin) * bands_per_octave)))
    cutoffs = fmin * (2.0 ** (np.arange(1, n_bands + 1) / bands_per_octave))

    best_f0 = np.zeros(T)
    best_rel = np.full(T, np.inf)
    for cutoff in cutoffs:
        y = _lowpass(x, sr, cutoff)
        if not np.any(np.abs(y) > 1e-9):
            continue
        sign = np.signbit(y)
        rising = np.nonzero(sign[:-1] & ~sign[1:])[0]
        falling = np.nonzero(~sign[:-1] & sign[1:])[0]
        dy = np.diff(y)
        dsign = np.signbit(dy)
        peaks = np.nonzero(~dsign[:-1] & dsign[1:])[0]
        dips = np.nonzero(dsign[:-1] & ~dsign[1:])[0]

        estimates = np.stack(
            [
                _interval_f0(ev, times, frame_times)
                for ev in (rising, falling, peaks, dips)
            ]
        )  # (4, T)
        mean = np.mean(estimates, axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            rel = np.std(estimates, axis=0) / np.maximum(mean, 1e-9)
        in_band = (mean > cutoff / 2.0) & (mean <= cutoff) & (mean >= fmin) & (mean <= fmax)
        ok = in_band & np.all(estimates > 0, axis=0) & np.isfinite(rel)
        better = ok & (rel < best_rel)
        best_f0 = np.where(better, mean, best_f0)
        best_rel = np.where(better, rel, best_rel)

    return np.where(best_rel <= reliability_threshold, best_f0, 0.0)


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
