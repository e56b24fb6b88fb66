"""Stonemask-style F0 refinement (host numpy) — the in-tree executable
equivalent of WORLD's ``stonemask`` step (reference f0_backends.py:126-147:
the pyworld backend refines every harvest/dio contour with
``pw.stonemask(audio, f0, t, sr)`` unless ``stonemask: false``).

StoneMask (Morise 2015) refines a coarse F0 estimate to sub-bin accuracy
using the instantaneous frequency of the fundamental component.  This
implementation reuses the analytic-band machinery of labels/harvest.py:

1. band-pass the signal around each frame's *current* F0 estimate (one
   batched FFT pass over a log-spaced band grid, one octave of raised
   cosine each side);
2. the refined F0 is the amplitude-weighted windowed mean of the chosen
   band's instantaneous frequency (phase derivative of the analytic
   signal) at the frame center;
3. frames whose refinement moves more than ``max_shift`` octaves are kept
   at the input estimate (a wild inst-freq reading means the band caught a
   neighbour partial, not the fundamental); unvoiced frames pass through
   untouched.

Used by the in-tree ``dio``/``harvest`` backends when their config sets
``stonemask: true`` — completing the reference trio
(harvest/dio/stonemask) executably, without pyworld.
"""

from __future__ import annotations

import numpy as np

from .harvest import _window_mean


def stonemask_refine(
    x: np.ndarray,
    sr: int,
    hop: int,
    f0: np.ndarray,
    bands_per_octave: int = 24,
    max_shift: float = 0.25,
) -> np.ndarray:
    """Refine ``f0`` (frame contour, zeros = unvoiced) against ``x``."""
    x = np.asarray(x, dtype=np.float64)
    f0 = np.asarray(f0, dtype=np.float64)
    n = len(x)
    T = len(f0)
    voiced = f0 > 0
    if n == 0 or not np.any(voiced):
        return f0.copy()

    fmin = float(np.min(f0[voiced]))
    fmax = float(np.max(f0[voiced]))
    n_bands = max(1, int(np.ceil(np.log2(max(fmax / fmin, 1.0 + 1e-9)) * bands_per_octave)) + 1)
    fcs = fmin * 2.0 ** (np.arange(n_bands) / bands_per_octave)

    spec = np.fft.fft(x)
    freqs = np.fft.fftfreq(n, 1.0 / sr)
    pos = freqs > 0
    with np.errstate(divide="ignore"):
        logdist = np.abs(np.log2(np.where(pos, freqs, 1.0)[None, :] / fcs[:, None]))
    gains = np.where(
        pos[None, :] & (logdist < 1.0),
        0.5 * (1.0 + np.cos(np.pi * np.minimum(logdist, 1.0))),
        0.0,
    )
    bands = np.fft.ifft(gains * (2.0 * spec)[None, :], axis=-1)

    rot = bands[:, 1:] * np.conj(bands[:, :-1])
    f_inst = np.angle(rot) * (sr / (2.0 * np.pi))
    amp = np.abs(bands)[:, :-1]

    frame_idx = np.minimum(np.arange(T) * hop, max(n - 2, 0))
    half = max(hop // 2, 2)
    # amplitude-weighted windowed instantaneous frequency per band/frame
    wf = _window_mean(f_inst * amp, frame_idx, half)
    wa = _window_mean(amp, frame_idx, half)
    f_frame = wf / np.maximum(wa, 1e-12)  # (n_bands, T)

    # pick the band nearest each frame's current estimate
    with np.errstate(divide="ignore"):
        band_idx = np.clip(
            np.round(np.log2(np.where(voiced, f0, fmin) / fmin) * bands_per_octave).astype(int),
            0,
            n_bands - 1,
        )
    refined = f_frame[band_idx, np.arange(T)]

    shift = np.abs(np.log2(np.maximum(refined, 1e-9) / np.maximum(f0, 1e-9)))
    ok = voiced & np.isfinite(refined) & (refined > 0) & (shift <= max_shift)
    return np.where(ok, refined, f0)
