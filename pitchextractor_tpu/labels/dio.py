"""Dio-style interval tracker (host numpy) — the in-tree executable
equivalent of the reference's default WORLD ``harvest``→``dio`` chain
(reference f0_backends.py:109-148, Configs/config.yml enables ``pyworld``
first in the cascade).

pyworld is not installed in this image, so the ``pyworld`` wrapper backend
(backends.py:262) can never construct; until round 4 the only dio-shaped
code in-tree was the timing tool ``tools/dio_baseline.py``.  This module
promotes that tracker into the package so the reference's default chain has
a *working* backend behind it (VERDICT r3 #7).

The algorithm follows the DIO paper's computational skeleton
(Morise, Kawahara & Katayose 2009 — no WORLD code consulted):

1. a bank of low-pass filtered copies of the signal, one candidate octave
   band each (FFT-domain raised-cosine low-pass),
2. per band, fundamental-period candidates from the four interval types
   (rising/falling zero crossings, peak and dip intervals), each giving a
   per-frame F0 estimate; their dispersion is the candidate's reliability,
3. per frame, the lowest-dispersion in-band candidate wins; frames whose
   dispersion exceeds ``reliability_threshold`` are unvoiced.

Deliberately host/numpy: it exists for reference-chain compatibility and as
the measured CPU baseline (RESULTS.md round-3 leg 2: 54.1 utt/s vs 970 on
device — the 17.9× on-device labeling ratio).  The TPU-native trackers
(``jax_ac``/``jax_yin``/``jax_pyin``) remain the framework defaults.
"""

from __future__ import annotations

import numpy as np


def lowpass(x: np.ndarray, sr: int, cutoff: float) -> np.ndarray:
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
    """Single-utterance dio-style F0 contour ``(1 + len(x)//hop,)`` in Hz,
    exact zeros marking unvoiced frames (the framework-wide contour
    contract, labels/base.py:56-64)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    T = 1 + n // hop
    frame_times = np.arange(T) * hop / sr
    times = np.arange(n) / sr

    n_bands = max(1, int(np.ceil(np.log2(fmax / fmin) * bands_per_octave)))
    cutoffs = fmin * (2.0 ** (np.arange(1, n_bands + 1) / bands_per_octave))

    best_f0 = np.zeros(T)
    best_rel = np.full(T, np.inf)
    # Band-energy floor RELATIVE to the input: a fully-stopped band's FFT
    # roundoff residual (~1e-9 for unit-scale input) is coherent enough to
    # produce low-dispersion phantom candidates (measured: a clean 440 Hz
    # tone voted 40 Hz through the 56/80 Hz bands), so an absolute floor is
    # not sufficient.
    floor = 1e-6 * float(np.max(np.abs(x)) if n else 0.0)
    for cutoff in cutoffs:
        y = lowpass(x, sr, cutoff)
        if not np.any(np.abs(y) > max(floor, 1e-12)):
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
