"""Analytic test stimuli (reference Utils/dynamic_pitch_tools.py:8-76).

Sine-from-F0-curve synthesis with raised-cosine fades, vibrato and glide
generators with exact F0 trajectories, and frame-rate reference resampling.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _apply_fade(audio: np.ndarray, sr: int, fade_time: float = 0.02) -> np.ndarray:
    fade_samples = int(max(fade_time * sr, 0))
    if fade_samples <= 0:
        return audio.astype(np.float32, copy=False)
    window = np.ones_like(audio, dtype=np.float64)
    ramp = 0.5 - 0.5 * np.cos(np.linspace(0.0, np.pi, fade_samples, dtype=np.float64))
    window[:fade_samples] = ramp
    window[-fade_samples:] = ramp[::-1]
    return (audio * window).astype(np.float32)


def synthesize_from_f0_curve(
    f0_curve: np.ndarray, sr: int, amplitude: float = 0.8
) -> np.ndarray:
    omega = 2.0 * np.pi * np.asarray(f0_curve, dtype=np.float64) / float(sr)
    phase = np.cumsum(omega)
    audio = amplitude * np.sin(phase)
    audio = _apply_fade(audio.astype(np.float32), sr)
    max_val = float(np.max(np.abs(audio))) if audio.size else 0.0
    if max_val > 0.99:
        audio = audio / (max_val + 1e-6)
    return audio.astype(np.float32)


def generate_vibrato_waveform(
    rate_hz: float, depth_cents: float, base_freq: float, duration: float, sr: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    t = np.linspace(0.0, duration, int(duration * sr), endpoint=False, dtype=np.float64)
    modulation = np.sin(2.0 * np.pi * rate_hz * t)
    f0_curve = base_freq * (2.0 ** ((depth_cents / 1200.0) * modulation))
    audio = synthesize_from_f0_curve(f0_curve, sr)
    return audio, t.astype(np.float32), f0_curve.astype(np.float32)


def generate_glide_waveform(
    duration: float, start_hz: float, end_hz: float, sr: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    t = np.linspace(0.0, duration, int(duration * sr), endpoint=False, dtype=np.float64)
    f0_curve = np.linspace(start_hz, end_hz, t.shape[0], dtype=np.float64)
    audio = synthesize_from_f0_curve(f0_curve, sr)
    return audio, t.astype(np.float32), f0_curve.astype(np.float32)


def sample_reference_f0(
    time_axis: np.ndarray, f0_curve: np.ndarray, num_frames: int
) -> np.ndarray:
    """Resample the analytic curve at the model frame rate
    (reference Utils/dynamic_pitch_tools.py:65-76)."""
    if num_frames <= 0:
        return np.zeros((0,), dtype=np.float32)
    if time_axis.size == 0:
        return np.zeros((num_frames,), dtype=np.float32)
    duration = time_axis[-1]
    if time_axis.size > 1:
        duration += time_axis[1] - time_axis[0]
    frame_times = np.linspace(0.0, duration, num=num_frames, endpoint=False, dtype=np.float64)
    reference = np.interp(frame_times, time_axis, f0_curve)
    return reference.astype(np.float32)
