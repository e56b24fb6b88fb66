"""Boersma-style autocorrelation tracker (host numpy) — the in-tree
executable equivalent of the reference's Praat backend
(reference f0_backends.py:437-578, ``Sound.to_pitch_ac``).

parselmouth/Praat is not installed in this image, so the wrapper backends
(backends.py ``PraatBackend``/``ParselmouthBackend``) can never construct.
Like labels/harvest.py and labels/dio.py for the WORLD chain, this module
gives the praat chain a *working* in-tree stand-in (registry types
``praat_ac``/``boersma``) with the same config knobs the reference passes
to ``to_pitch_ac`` (silence/voicing thresholds, octave and transition
costs).

The algorithm follows Boersma's published method (Boersma 1993,
"Accurate short-term analysis of the fundamental frequency and the
harmonics-to-noise ratio of a sampled sound" — no Praat code consulted):

1. frames of 3 fundamental periods of ``min_pitch``, local mean removed,
   Hanning-windowed;
2. the frame's normalized autocorrelation divided by the window's own
   autocorrelation (the paper's central tapering correction);
3. local maxima in the candidate lag range, parabolically interpolated;
   candidate strength ``r − octave_cost·log2(min_pitch·lag)``, plus the
   paper's unvoiced candidate whose strength rises as the frame's local
   peak falls relative to the global peak;
4. a Viterbi path over candidates with ``octave_jump_cost`` (per octave)
   and ``voiced_unvoiced_cost`` transition penalties.

Deliberately host/numpy: the TPU-native trackers (``jax_ac``/``jax_yin``/
``jax_pyin``) remain the framework defaults.
"""

from __future__ import annotations

import numpy as np


def praat_ac_track(
    x: np.ndarray,
    sr: int,
    hop: int,
    min_pitch: float = 40.0,
    max_pitch: float = 800.0,
    silence_threshold: float = 0.03,
    voicing_threshold: float = 0.45,
    octave_cost: float = 0.01,
    octave_jump_cost: float = 0.35,
    voiced_unvoiced_cost: float = 0.14,
    max_candidates: int = 4,
) -> np.ndarray:
    """Single-utterance F0 contour ``(1 + len(x)//hop,)`` in Hz, exact
    zeros marking unvoiced frames (labels/base.py:56-64 contract)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    T = 1 + n // hop
    if n == 0:
        return np.zeros(1)

    win = int(round(3.0 * sr / min_pitch))
    win = min(max(win, 2 * hop), max(n, 2))
    half = win // 2
    global_peak = float(np.max(np.abs(x))) if n else 0.0
    if global_peak <= 0.0:
        return np.zeros(T)

    lag_min = max(2, int(np.floor(sr / max_pitch)))
    lag_max = min(win - 2, int(np.ceil(sr / min_pitch)))
    if lag_max <= lag_min:
        return np.zeros(T)

    # gather frames (T, win), zero-padded at the edges
    pad = np.concatenate([np.zeros(half), x, np.zeros(win)])
    starts = np.arange(T) * hop  # centered: frame k covers [k*hop-half, ...)
    idx = starts[:, None] + np.arange(win)[None, :]
    frames = pad[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)
    local_peak = np.max(np.abs(frames), axis=1)

    window = np.hanning(win)
    fw = frames * window

    # normalized autocorrelation via rFFT, divided by the window's own
    nfft = int(2 ** np.ceil(np.log2(2 * win)))
    spec = np.fft.rfft(fw, nfft, axis=1)
    ac = np.fft.irfft(spec * np.conj(spec), nfft, axis=1)[:, :win]
    ac0 = np.maximum(ac[:, :1], 1e-12)
    wac = np.fft.irfft(np.abs(np.fft.rfft(window, nfft)) ** 2, nfft)[:win]
    wac = wac / max(wac[0], 1e-12)
    r = (ac / ac0) / np.maximum(wac[None, :], 1e-6)  # (T, win)

    # candidate peaks in the admissible lag band, parabolic interpolation
    band = r[:, lag_min : lag_max + 1]
    left = r[:, lag_min - 1 : lag_max]
    right = r[:, lag_min + 1 : lag_max + 2]
    is_peak = (band > left) & (band >= right)
    lags = np.arange(lag_min, lag_max + 1)

    strengths = np.full((T, max_candidates + 1), -1e9)
    cand_f0 = np.zeros((T, max_candidates + 1))
    # candidate 0 is "unvoiced" (Boersma eq. 23)
    denom = silence_threshold / (1.0 + voicing_threshold)
    strengths[:, 0] = voicing_threshold + np.maximum(
        0.0, 2.0 - (local_peak / global_peak) / max(denom, 1e-9)
    )

    for ti in range(T):
        pk = np.nonzero(is_peak[ti])[0]
        if pk.size == 0:
            continue
        cands = []  # (strength, f0) for every admissible peak
        for pi in pk:
            lag = float(lags[pi])
            # parabolic refinement of lag and value
            if 0 < pi < band.shape[1] - 1:
                y0, y1, y2 = band[ti, pi - 1], band[ti, pi], band[ti, pi + 1]
                d = y0 - 2 * y1 + y2
                if abs(d) > 1e-12:
                    delta = 0.5 * (y0 - y2) / d
                    delta = float(np.clip(delta, -1.0, 1.0))
                    lag += delta
                    val = y1 - 0.25 * (y0 - y2) * delta
                else:
                    val = y1
            else:
                val = band[ti, pi]
            f0 = sr / lag
            if not (min_pitch <= f0 <= max_pitch):
                continue
            # rank by the octave-cost-ADJUSTED strength: a pure tone has
            # near-equal autocorrelation peaks at every period multiple,
            # and ranking by raw value resolves those ties toward the
            # subharmonic (longest lag); the adjusted strength is what
            # the path search maximizes, so select candidates by it too
            strength = min(float(val), 1.0) - octave_cost * np.log2(
                min_pitch * lag / sr
            )
            cands.append((strength, f0))
        cands.sort(key=lambda c: -c[0])
        for ci, (strength, f0) in enumerate(cands[:max_candidates]):
            cand_f0[ti, ci + 1] = f0
            strengths[ti, ci + 1] = strength

    # Viterbi over candidates (maximize strength minus transition costs)
    C = max_candidates + 1
    score = strengths[0].copy()
    back = np.zeros((T, C), dtype=np.int64)
    for ti in range(1, T):
        f_prev = cand_f0[ti - 1]  # (C,)
        f_cur = cand_f0[ti]
        vo_prev = f_prev > 0
        vo_cur = f_cur > 0
        trans = np.zeros((C, C))
        both = vo_prev[:, None] & vo_cur[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            jump = np.abs(np.log2(np.where(both, f_prev[:, None] / np.maximum(f_cur[None, :], 1e-9), 1.0)))
        trans += np.where(both, octave_jump_cost * jump, 0.0)
        trans += np.where(vo_prev[:, None] != vo_cur[None, :], voiced_unvoiced_cost, 0.0)
        total = score[:, None] - trans + strengths[ti][None, :]
        back[ti] = np.argmax(total, axis=0)
        score = total[back[ti], np.arange(C)]

    path = np.zeros(T, dtype=np.int64)
    path[-1] = int(np.argmax(score))
    for ti in range(T - 1, 0, -1):
        path[ti - 1] = back[ti, path[ti]]
    return cand_f0[np.arange(T), path]
