"""Filters for the robustness-evaluation suites.

Host-side equivalents of the torchaudio DSP the reference notebooks use
(SURVEY.md §2.12/§2.13): RBJ peaking-EQ biquads (``equalizer_biquad`` in the
room/mic notebook), FFT convolution for RIR application, synthetic
exponential-decay RIR generation, clipping, and AGC pumping.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
from scipy import signal as sps


def equalizer_biquad_coeffs(sr: int, center_freq: float, gain_db: float, q: float = 0.707):
    """RBJ peaking EQ coefficients (matches torchaudio.functional.equalizer_biquad)."""
    w0 = 2.0 * math.pi * center_freq / sr
    a_gain = 10.0 ** (gain_db / 40.0)
    alpha = math.sin(w0) / (2.0 * q)
    b0 = 1.0 + alpha * a_gain
    b1 = -2.0 * math.cos(w0)
    b2 = 1.0 - alpha * a_gain
    a0 = 1.0 + alpha / a_gain
    a1 = -2.0 * math.cos(w0)
    a2 = 1.0 - alpha / a_gain
    b = np.array([b0, b1, b2]) / a0
    a = np.array([1.0, a1 / a0, a2 / a0])
    return b, a


def equalizer_biquad(audio: np.ndarray, sr: int, center_freq: float, gain_db: float, q: float = 0.707) -> np.ndarray:
    b, a = equalizer_biquad_coeffs(sr, center_freq, gain_db, q)
    return sps.lfilter(b, a, np.asarray(audio, dtype=np.float64)).astype(np.float32)


def apply_microphone_eq(audio: np.ndarray, sr: int, stages: Sequence[dict]) -> np.ndarray:
    """Cascaded peaking-EQ stages (room/mic notebook ``apply_microphone_eq``)."""
    out = np.asarray(audio, dtype=np.float32)
    for stage in stages:
        out = equalizer_biquad(
            out,
            sr,
            center_freq=float(stage["center_freq"]),
            gain_db=float(stage["gain_db"]),
            q=float(stage.get("q", 0.707)),
        )
    return out


def fft_convolve(audio: np.ndarray, kernel: np.ndarray, mode: str = "full") -> np.ndarray:
    return sps.fftconvolve(np.asarray(audio, dtype=np.float64), np.asarray(kernel, dtype=np.float64), mode=mode).astype(np.float32)


def synthesize_rir(
    sr: int,
    t60: float,
    direct_delay_s: float = 0.002,
    direct_gain: float = 1.0,
    seed: int = 0,
    length_factor: float = 1.2,
) -> np.ndarray:
    """Synthetic RIR: direct impulse + exponentially decaying noise tail with
    the requested T60 (room/mic notebook room-category grid)."""
    rng = np.random.default_rng(seed)
    length = max(int(sr * t60 * length_factor), int(sr * 0.01))
    t = np.arange(length) / sr
    decay = np.exp(-6.9077552789821 * t / max(t60, 1e-3))  # ln(1000) for -60 dB
    tail = rng.standard_normal(length) * decay
    rir = 0.25 * tail / max(np.max(np.abs(tail)), 1e-9)
    direct_idx = int(direct_delay_s * sr)
    if direct_idx >= length:
        direct_idx = 0
    rir[direct_idx] += direct_gain
    return rir.astype(np.float32)


def apply_rir(audio: np.ndarray, rir: np.ndarray) -> np.ndarray:
    """Convolve and trim to the input length, normalising peak like the
    notebook ``apply_rir``."""
    wet = fft_convolve(audio, rir, mode="full")[: len(audio)]
    peak = np.max(np.abs(wet))
    ref_peak = np.max(np.abs(audio))
    if peak > 0 and ref_peak > 0:
        wet = wet * (ref_peak / peak)
    return wet.astype(np.float32)


def clip_audio(audio: np.ndarray, clip_fraction: float) -> np.ndarray:
    """Quantile-based sample clipping (amplitude notebook): the loudest
    ``clip_fraction`` of samples saturate."""
    audio = np.asarray(audio, dtype=np.float32)
    if clip_fraction <= 0:
        return audio
    threshold = np.quantile(np.abs(audio), 1.0 - clip_fraction)
    if threshold <= 0:
        return audio
    return np.clip(audio, -threshold, threshold)


def agc_pump(audio: np.ndarray, sr: int, depth_db: float, rate_hz: float = 2.0) -> np.ndarray:
    """Sinusoidal gain pumping of the requested peak-to-peak depth in dB
    (amplitude notebook AGC sweep)."""
    audio = np.asarray(audio, dtype=np.float32)
    if depth_db <= 0:
        return audio
    t = np.arange(len(audio)) / sr
    gain_db = (depth_db / 2.0) * np.sin(2.0 * np.pi * rate_hz * t)
    return (audio * 10.0 ** (gain_db / 20.0)).astype(np.float32)


def add_noise_snr(audio: np.ndarray, snr_db: float, color: str = "white", seed: int = 0) -> np.ndarray:
    """Additive noise at a target SNR (noise-robustness suite)."""
    audio = np.asarray(audio, dtype=np.float32)
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(len(audio))
    if color == "pink":
        # -3 dB/octave via 1/sqrt(f) spectral shaping
        spec = np.fft.rfft(noise)
        freqs = np.fft.rfftfreq(len(noise))
        spec = spec / np.sqrt(np.maximum(freqs, freqs[1] if len(freqs) > 1 else 1e-6))
        noise = np.fft.irfft(spec, n=len(noise))
    sig_power = float(np.mean(audio**2))
    noise_power = float(np.mean(noise**2))
    if noise_power <= 0 or sig_power <= 0:
        return audio
    scale = math.sqrt(sig_power / (noise_power * 10.0 ** (snr_db / 10.0)))
    return (audio + scale * noise).astype(np.float32)
