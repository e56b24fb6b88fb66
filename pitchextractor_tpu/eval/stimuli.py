"""Batched analytic test stimuli, rendered on device.

TPU-first replacement for the reference's per-stimulus host generators
(Utils/dynamic_pitch_tools.py:8-76): an entire sweep's worth of F0
trajectories is assembled as one (N, S) array and rendered to audio in a
single jitted device program (phase-integration sine synthesis).  Rows may
have different true lengths; the bank is rectangular with per-row sample
counts, and fades/normalization respect each row's own length.

Behavioral contract preserved from the reference generators: 20 ms
raised-cosine fades, 0.8 peak amplitude, re-normalization whenever the
faded peak still exceeds 0.99, and frame-rate reference resampling with
``endpoint=False`` frame timing.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("sr", "fade_time"))
def _render_sine_bank(phase_mod, lengths, partial_amps, sr, fade_time=0.02):
    """(N, S) wrapped phase curves -> (N, S) audio, one device dispatch.

    ``phase_mod`` is the accumulated phase wrapped to [0, 2pi), computed in
    float64 on the host (``_exact_phase``).  Accumulating phase on device in
    f32 is NOT exact: by mid-clip the phase reaches thousands of radians
    where the f32 ulp quantizes per-sample increments by up to ~1%, biasing
    the rendered instantaneous frequency by ~10+ cents in stretches — and
    the quantization pattern depends on the backend's scan order, so the
    same nominal stimulus rendered on CPU, TPU, or across compiler updates
    lands at measurably different frequencies (observed as a cross-day
    suite-score shift, RESULTS round-4 leg D).  Wrapped f64 host phase makes
    the stimulus exact and device-independent; ``k * phase_mod`` stays below
    ~64 rad for the partials used, where f32 sin is sub-cent accurate.

    partial_amps: (N, K) harmonic amplitudes; column k drives partial k+1.
    A pure sine bank passes ``[[amplitude]]`` broadcast to (N, 1).
    """
    phase = phase_mod
    k = jnp.arange(1, partial_amps.shape[1] + 1, dtype=phase.dtype)
    audio = jnp.einsum("nk,nks->ns", partial_amps, jnp.sin(k[None, :, None] * phase[:, None, :]))

    idx = jnp.arange(phase.shape[1])[None, :]
    alive = idx < lengths[:, None]
    fade_n = max(int(fade_time * sr), 1)
    denom = max(fade_n - 1, 1)
    up = jnp.where(idx < fade_n, 0.5 - 0.5 * jnp.cos(jnp.pi * idx / denom), 1.0)
    ridx = lengths[:, None] - 1 - idx
    down = jnp.where(ridx < fade_n, 0.5 - 0.5 * jnp.cos(jnp.pi * jnp.maximum(ridx, 0) / denom), 1.0)
    audio = audio * up * down * alive

    peak = jnp.max(jnp.abs(audio), axis=-1, keepdims=True)
    audio = jnp.where(peak > 0.99, audio / (peak + 1e-6), audio)
    return audio.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_frames", "hop"))
def _frame_sample(curves, lengths, num_frames, hop=0):
    """Per-row linear resampling of (N, S) sample-rate curves onto frame
    times.

    ``hop > 0``: frame k samples the curve at sample ``k*hop`` (clamped to
    the row's true length) — the model's actual frame convention (mel frame
    k is centered at sample ``k*hop``).  ``hop == 0``: the reference
    notebooks' ``sample_reference_f0`` timing, ``k * length/num_frames`` —
    a compressed time base that is wrong by up to one full frame at the end
    of a row (114 cents on the 0.4 s 60-to-500 Hz glide) and kept only for
    parity with the upstream metric."""
    if hop > 0:
        frac = jnp.minimum(
            jnp.full((1, num_frames), float(hop)) * jnp.arange(num_frames)[None, :],
            lengths[:, None].astype(jnp.float32) - 1.0,
        )
    else:
        frac = jnp.arange(num_frames)[None, :] * (
            lengths[:, None].astype(jnp.float32) / num_frames
        )
    lo = jnp.clip(jnp.floor(frac).astype(jnp.int32), 0, curves.shape[1] - 1)
    hi = jnp.clip(lo + 1, 0, curves.shape[1] - 1)
    w = frac - lo
    v_lo = jnp.take_along_axis(curves, lo, axis=-1)
    v_hi = jnp.take_along_axis(curves, hi, axis=-1)
    return (1.0 - w) * v_lo + w * v_hi


@dataclasses.dataclass
class StimulusBank:
    """A rectangular batch of stimuli with per-row true lengths."""

    audio: np.ndarray  # (N, S) float32, silent past each row's length
    f0: np.ndarray  # (N, S) float32 sample-rate contours
    lengths: np.ndarray  # (N,) int true sample counts
    sr: int

    def __len__(self) -> int:
        return self.audio.shape[0]

    def waveforms(self) -> List[np.ndarray]:
        """Per-row audio trimmed to true length (predict_f0_batch input)."""
        return [self.audio[i, : self.lengths[i]] for i in range(len(self))]

    def frame_reference(self, num_frames: int, hop: int = 0) -> np.ndarray:
        """(N, num_frames) analytic contours at the model frame rate.

        Pass the model ``hop`` (samples) for exact ``k*hop`` frame timing;
        hop=0 reproduces the upstream notebooks' compressed time base
        (see ``_frame_sample``)."""
        return np.asarray(
            _frame_sample(
                jnp.asarray(self.f0), jnp.asarray(self.lengths), int(num_frames), int(hop)
            )
        )

    def frame_reference_row(self, row: int, num_frames: int, hop: int = 0) -> np.ndarray:
        curve = self.f0[row, : self.lengths[row]]
        bank = _frame_sample(
            jnp.asarray(curve[None, :]), jnp.asarray([len(curve)]), int(num_frames), int(hop)
        )
        return np.asarray(bank)[0]


def render_bank(
    f0_curves: np.ndarray,
    lengths: np.ndarray,
    sr: int,
    amplitude: float = 0.8,
    partials: Sequence[Sequence[Tuple[int, float]]] = None,
) -> StimulusBank:
    """Render (N, S) F0 curves to a StimulusBank.

    partials: optional per-row list of (harmonic_index, amplitude) pairs;
    default is a pure sine at ``amplitude`` (the reference generator).
    """
    f0_curves = np.asarray(f0_curves, dtype=np.float32)
    if f0_curves.ndim == 1:
        f0_curves = f0_curves[None, :]
    n, s = f0_curves.shape
    lengths = np.asarray(lengths, dtype=np.int32).reshape(n)

    if partials is None:
        amps = np.full((n, 1), float(amplitude), dtype=np.float32)
    else:
        kmax = max((k for row in partials for k, _ in row), default=1)
        amps = np.zeros((n, kmax), dtype=np.float32)
        for i, row in enumerate(partials):
            for k, a in row:
                amps[i, k - 1] = a

    audio = np.asarray(
        _render_sine_bank(
            jnp.asarray(_exact_phase(f0_curves, sr)), jnp.asarray(lengths), jnp.asarray(amps), int(sr)
        )
    )
    return StimulusBank(audio=audio, f0=f0_curves, lengths=lengths, sr=int(sr))


def _exact_phase(f0_curves: np.ndarray, sr: int) -> np.ndarray:
    """Float64 host phase accumulation wrapped to [0, 2pi), cast to f32.

    See ``_render_sine_bank``: the wrap keeps the carried-to-device values
    small enough that f32 holds them to ~1e-7 rad, so the rendered
    instantaneous frequency matches the nominal curve to well under a cent
    regardless of backend."""
    phase = 2.0 * np.pi * np.cumsum(np.asarray(f0_curves, dtype=np.float64) / float(sr), axis=-1)
    return np.mod(phase, 2.0 * np.pi).astype(np.float32)


# ----------------------------------------------------------------- curves
def vibrato_bank(
    rates_hz: Sequence[float],
    depths_cents: Sequence[float],
    base_freq: float,
    duration: float,
    sr: int,
) -> Tuple[StimulusBank, List[dict]]:
    """Full rate × depth sweep as one bank (dynamic_pitch notebook cell 4)."""
    grid = [(r, d) for r in rates_hz for d in depths_cents]
    s = int(duration * sr)
    t = np.arange(s, dtype=np.float64) / sr
    rows = np.stack(
        [
            base_freq * 2.0 ** ((d / 1200.0) * np.sin(2.0 * np.pi * r * t))
            for r, d in grid
        ]
    )
    bank = render_bank(rows, np.full(len(grid), s), sr)
    tags = [{"rate_hz": r, "depth_cents": d} for r, d in grid]
    return bank, tags


def glide_bank(
    durations: Sequence[float], start_hz: float, end_hz: float, sr: int
) -> Tuple[StimulusBank, List[dict]]:
    """Linear glides of several durations, padded to the longest."""
    lengths = np.array([int(d * sr) for d in durations], dtype=np.int32)
    s = int(lengths.max())
    rows = np.zeros((len(durations), s), dtype=np.float64)
    for i, n in enumerate(lengths):
        rows[i, :n] = np.linspace(start_hz, end_hz, n)
    bank = render_bank(rows, lengths, sr)
    tags = [{"duration_s": d} for d in durations]
    return bank, tags


def tone_bank(freqs: Sequence[float], duration: float, sr: int) -> StimulusBank:
    """Constant tones (amplitude_pathologies notebook cell 6)."""
    s = int(duration * sr)
    rows = np.repeat(np.asarray(freqs, dtype=np.float64)[:, None], s, axis=1)
    return render_bank(rows, np.full(len(freqs), s), sr)


def wander_curve(
    base_hz: float, depth_octaves: float, rate_hz: float, duration: float, sr: int
) -> np.ndarray:
    """Slow sinusoidal pitch wander used by the degradation suites."""
    t = np.arange(int(duration * sr), dtype=np.float64) / sr
    return base_hz * 2.0 ** (depth_octaves * np.sin(2.0 * np.pi * rate_hz * t))


def harmonic_bank(
    f0_curves: np.ndarray,
    partials: Sequence[Sequence[Tuple[int, float]]],
    sr: int,
    peak: float = 0.7,
) -> StimulusBank:
    """Multi-partial timbres (pitch_range notebook cell 7): each row is
    rendered as its own harmonic sum, normalized to ``peak``."""
    f0_curves = np.asarray(f0_curves, dtype=np.float32)
    if f0_curves.ndim == 1:
        f0_curves = np.repeat(f0_curves[None, :], len(partials), axis=0)
    # drop partials above Nyquist for each row (host-side: ragged per row)
    nyq = sr / 2.0
    safe = [
        [(k, a) for k, a in row if k * float(f0_curves[i].max()) < nyq]
        for i, row in enumerate(partials)
    ]
    lengths = np.full(f0_curves.shape[0], f0_curves.shape[1], dtype=np.int32)
    bank = render_bank(f0_curves, lengths, sr, partials=safe)
    peaks = np.abs(bank.audio).max(axis=-1, keepdims=True)
    bank.audio = np.where(peaks > 0, peak * bank.audio / np.maximum(peaks, 1e-9), bank.audio)
    return bank


# ------------------------------------------------- scalar compatibility API
def synthesize_from_f0_curve(f0_curve: np.ndarray, sr: int, amplitude: float = 0.8) -> np.ndarray:
    """One curve -> audio (reference Utils/dynamic_pitch_tools.py:21-34)."""
    curve = np.asarray(f0_curve, dtype=np.float64).reshape(1, -1)
    return render_bank(curve, [curve.shape[1]], sr, amplitude=amplitude).audio[0]


def generate_vibrato_waveform(
    rate_hz: float, depth_cents: float, base_freq: float, duration: float, sr: int
):
    bank, _ = vibrato_bank([rate_hz], [depth_cents], base_freq, duration, sr)
    t = np.arange(bank.audio.shape[1], dtype=np.float64) / sr
    return bank.audio[0], t.astype(np.float32), bank.f0[0]


def generate_glide_waveform(duration: float, start_hz: float, end_hz: float, sr: int):
    bank, _ = glide_bank([duration], start_hz, end_hz, sr)
    t = np.arange(bank.audio.shape[1], dtype=np.float64) / sr
    return bank.audio[0], t.astype(np.float32), bank.f0[0]


def sample_reference_f0(time_axis: np.ndarray, f0_curve: np.ndarray, num_frames: int) -> np.ndarray:
    """Resample an analytic curve at the model frame rate (reference
    Utils/dynamic_pitch_tools.py:65-76 timing: endpoint=False over the
    curve's total duration)."""
    if num_frames <= 0 or np.asarray(time_axis).size == 0:
        return np.zeros((max(num_frames, 0),), dtype=np.float32)
    curve = np.asarray(f0_curve, dtype=np.float32).reshape(1, -1)
    out = _frame_sample(jnp.asarray(curve), jnp.asarray([curve.shape[1]]), int(num_frames))
    return np.asarray(out, dtype=np.float32)[0]
