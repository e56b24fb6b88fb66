"""Pitch shifting via phase-vocoder time stretch + resampling.

Replaces ``librosa.effects.pitch_shift`` in the synthetic-data path
(reference meldataset.py:481-486).  librosa's implementation is time-stretch
(phase vocoder) followed by resampling; we do the same with the in-tree STFT
and sinc resampler, so the output length equals the input length and pitch
moves by ``2^(n_steps/12)`` while duration is preserved.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

from .stft import stft_np, _padded_window_np
from .resample import resample_np


def _istft_np(spec: np.ndarray, n_fft: int, hop_length: int, win_length: int, length: int) -> np.ndarray:
    """Inverse STFT with windowed overlap-add (matches stft_np conventions)."""
    window = _padded_window_np(n_fft, win_length)
    frames = np.fft.irfft(spec, n=n_fft, axis=0).T  # (n_frames, n_fft)
    n_frames = frames.shape[0]
    expected = n_fft + hop_length * (n_frames - 1)
    out = np.zeros(expected)
    norm = np.zeros(expected)
    wsq = window * window
    for i in range(n_frames):
        start = i * hop_length
        out[start : start + n_fft] += frames[i] * window
        norm[start : start + n_fft] += wsq
    out = out / np.maximum(norm, 1e-8)
    pad = n_fft // 2
    return out[pad : pad + length]


def time_stretch(waveform: np.ndarray, rate: float, n_fft: int = 2048, hop_length: int = 512) -> np.ndarray:
    """Phase-vocoder time stretch: rate > 1 speeds up (shorter output).

    Fully vectorized: the per-output-frame phase accumulation is a cumulative
    sum of (wrapped) instantaneous phase advances, so the whole vocoder is a
    handful of gathers + one cumsum instead of a Python loop over frames.
    """
    x = np.asarray(waveform, dtype=np.float64)
    spec = stft_np(x, n_fft=n_fft, hop_length=hop_length, win_length=n_fft)
    n_freq, n_frames = spec.shape

    time_steps = np.arange(0, n_frames, rate)
    phi_advance = np.linspace(0, np.pi * hop_length, n_freq)[:, None]

    mag = np.abs(spec)
    phase = np.angle(spec)

    i0 = np.floor(time_steps).astype(int)
    i1 = np.minimum(i0 + 1, n_frames - 1)
    frac = time_steps - i0

    m = (1.0 - frac)[None, :] * mag[:, i0] + frac[None, :] * mag[:, i1]
    dphase = phase[:, i1] - phase[:, i0] - phi_advance
    dphase = dphase - 2.0 * np.pi * np.round(dphase / (2.0 * np.pi))
    advances = phi_advance + dphase  # advance applied AFTER each frame
    phase_acc = phase[:, 0:1] + np.concatenate(
        [np.zeros((n_freq, 1)), np.cumsum(advances[:, :-1], axis=1)], axis=1
    )
    out = m * np.exp(1j * phase_acc)

    out_length = int(round(len(x) / rate))
    y = _istft_np(out, n_fft=n_fft, hop_length=hop_length, win_length=n_fft, length=out_length)
    return y.astype(np.float32)


def pitch_shift(waveform: np.ndarray, sr: int, n_steps: float) -> np.ndarray:
    """Shift pitch by ``n_steps`` semitones, preserving duration."""
    if abs(n_steps) < 1e-9:
        return np.asarray(waveform, dtype=np.float32)
    rate = 2.0 ** (-float(n_steps) / 12.0)
    stretched = time_stretch(np.asarray(waveform, dtype=np.float32), rate)
    # speed the stretched signal back up by 1/rate (librosa: resample from
    # sr/rate to sr): output length = len(stretched) * rate = original length,
    # pitch scaled by 2^(n_steps/12).  The polyphase resampler only uses the
    # rate ratio, so pass the rational approximation directly.
    frac = Fraction(rate).limit_denominator(1000)
    shifted = resample_np(stretched, frac.denominator, frac.numerator)
    n = len(waveform)
    if len(shifted) < n:
        shifted = np.pad(shifted, (0, n - len(shifted)))
    return shifted[:n].astype(np.float32)
