"""Synthetic speech generation with exact analytic F0 ground truth.

The reference synthesises vowel-like utterances through the WORLD vocoder
(Utils/synthetic.py:71-220): Gaussian formant envelopes, piecewise-linear
random F0 segments with probabilistic vibrato, zero aperiodicity.  WORLD is a
native C++ dependency; since the contour is *specified up-front*, the
idiomatic replacement (SURVEY.md §7 hard-part #7) is a harmonic additive
synthesizer — a band-limited pulse train shaped by the same formant
envelopes — which produces the exact F0 by construction with no native dep.

Config schema matches the reference ``synthetic_data.world_vocoder`` section
(Configs/config.yml:169-180): duration.{min,max}, pitch_range, gain_db_range,
noise_db, modulation.{vibrato_probability, vibrato_semitones,
vibrato_rate_range}, vowel_profiles.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

DEFAULT_VOWELS: Tuple[Dict, ...] = (
    {
        "label": "ah",
        "formants": ((730.0, 90.0, 1.0), (1090.0, 110.0, 0.6), (2440.0, 150.0, 0.4)),
    },
    {
        "label": "ih",
        "formants": ((390.0, 80.0, 1.0), (1990.0, 120.0, 0.6), (2550.0, 160.0, 0.4)),
    },
    {
        "label": "uh",
        "formants": ((440.0, 70.0, 1.0), (1020.0, 90.0, 0.6), (2240.0, 150.0, 0.4)),
    },
)


def _db_to_amplitude(db_value: float) -> float:
    return float(10.0 ** (db_value / 20.0))


def _as_pair(value, name: str, scalar_ok: bool = False) -> Tuple[float, float]:
    """Coerce a config value into a sorted (lo, hi) float pair."""
    if scalar_ok and isinstance(value, (int, float)):
        v = float(value)
        return (v, v)
    vals = [float(v) for v in value]
    if len(vals) != 2:
        raise ValueError(f"{name}: expected [lo, hi], got {value!r}")
    return (min(vals), max(vals))


@dataclass
class ModulationConfig:
    vibrato_probability: float = 0.6
    vibrato_semitones: float = 0.35
    vibrato_rate_range: Tuple[float, float] = (4.0, 7.0)
    max_segments: int = 4


@dataclass(frozen=True)
class SynthesisParams:
    """Parsed ``synthetic_data.world_vocoder`` section (schema contract with
    Configs/config.yml:169-180; the reference consumes the same keys via
    inline ``.get()`` chains, Utils/synthetic.py:89-119)."""

    duration_s: Tuple[float, float] = (0.5, 1.8)
    pitch_hz: Tuple[float, float] = (110.0, 320.0)
    pitch_log_uniform: bool = False
    gain_db: Tuple[float, float] = (-18.0, -6.0)
    noise_db: Optional[float] = -60.0
    tone_probability: float = 0.0
    tone_partials_max: int = 4

    @classmethod
    def from_config(cls, cfg: Dict) -> "SynthesisParams":
        dur = cfg.get("duration") or {}
        duration_s = (float(dur.get("min", 0.5)), float(dur.get("max", 1.8)))
        if duration_s[1] <= 0:
            raise ValueError("Synthetic duration must be positive")
        noise = cfg.get("noise_db", -60.0)
        return cls(
            duration_s=duration_s,
            pitch_hz=_as_pair(cfg.get("pitch_range", (110.0, 320.0)), "pitch_range"),
            # log-uniform pitch sampling (off by default: the reference samples
            # uniform in Hz, Utils/synthetic.py:157; labeler self-training turns
            # this on so every octave gets equal coverage)
            pitch_log_uniform=bool(cfg.get("pitch_log_uniform", False)),
            gain_db=_as_pair(
                cfg.get("gain_db_range", (-18.0, -6.0)), "gain_db_range", scalar_ok=True
            ),
            noise_db=None if noise is None else float(noise),
            tone_probability=float(cfg.get("tone_probability", 0.0)),
            tone_partials_max=max(1, int(cfg.get("tone_partials_max", 4))),
        )


def _formant_envelope(freqs: np.ndarray, formants: Sequence) -> Optional[np.ndarray]:
    """Spectral envelope for one vowel: a sum of Gaussian resonance bumps
    (centre Hz, bandwidth Hz, relative amplitude), broadcast over
    (n_formants, n_bins) in one shot.  Returns None when no usable formant
    rows exist so the caller can drop the profile."""
    rows = [
        (float(f[0]), float(f[1]) if float(f[1]) > 0 else 60.0,
         float(f[2]) if len(f) > 2 else 1.0)
        for f in formants
        if len(f) >= 2
    ]
    if not rows:
        return None
    centers, widths, amps = np.asarray(rows, dtype=np.float64).T
    z = (freqs[None, :] - centers[:, None]) / (0.5 * widths[:, None])
    env = (amps[:, None] * np.exp(-0.5 * z * z)).sum(axis=0)
    return np.maximum(env, 1e-3)


class HarmonicSynthesizer:
    """Generate vowel-like waveforms with known F0 (WORLD-synthesis stand-in).

    Public contract mirrors the reference ``WorldSynthesizer``
    (Utils/synthetic.py:74-220): ``generate() -> (waveform float32 samples,
    f0 float32 per hop-frame)``.
    """

    def __init__(
        self,
        sample_rate: int,
        hop_length: int,
        fft_size: Optional[int] = None,
        config: Optional[Dict] = None,
        verbose: bool = False,
        rng: Optional[np.random.Generator] = None,
    ) -> None:
        self.sample_rate = int(sample_rate)
        self.hop_length = int(hop_length)
        self.fft_size = int(fft_size or 1024)
        self.verbose = verbose
        self.rng = rng or np.random.default_rng()
        self.frame_period = 1000.0 * self.hop_length / self.sample_rate

        cfg = dict(config or {})
        self.params = SynthesisParams.from_config(cfg)
        self.modulation = ModulationConfig(**(cfg.get("modulation") or {}))

        # Pure-tone / sparse-partial stimuli (round-2 domain-gap fix): the
        # eval suites drive single-partial sines and few-partial timbres
        # (reference Utils/dynamic_pitch_tools.py:21-62, pitch-range notebook
        # partial sets), which are spectrally unlike the formant vowels; with
        # probability ``tone_probability`` a sample is synthesised from a
        # sparse partial set (1 = pure sine) instead of a vowel envelope.
        self.tone_probability = self.params.tone_probability
        self.tone_partials_max = self.params.tone_partials_max

        freqs = np.linspace(0.0, self.sample_rate / 2.0, self.fft_size // 2 + 1)
        profiles = cfg.get("vowel_profiles") or DEFAULT_VOWELS
        self._templates = [
            env
            for profile in profiles
            if (env := _formant_envelope(freqs, profile.get("formants", ()))) is not None
        ]
        if not self._templates:
            raise ValueError("vowel_profiles yielded no usable formant envelopes")

    # ------------------------------------------------------------------
    def _sample_duration(self) -> float:
        lo, hi = self.params.duration_s
        if hi <= lo:
            return max(hi, 0.1)
        return float(self.rng.uniform(lo, hi))

    def _sample_pitch(self) -> float:
        lo, hi = self.params.pitch_hz
        if self.params.pitch_log_uniform:
            return float(np.exp(self.rng.uniform(np.log(lo), np.log(hi))))
        return float(self.rng.uniform(lo, hi))

    def _sample_f0_curve(self, num_frames: int) -> np.ndarray:
        """Random piecewise-linear contour with probabilistic semitone
        vibrato — the trajectory family of the reference's curve sampler
        (Utils/synthetic.py:155-191), re-derived: a single-segment draw is a
        flat contour; a multi-segment draw places its interior breakpoints
        as sorted uniform frame fractions and evaluates the whole polyline
        with one vectorized ``np.interp`` instead of per-segment splicing.
        """
        max_segments = max(1, int(self.modulation.max_segments))
        n_segments = int(self.rng.integers(1, max_segments + 1))
        if n_segments == 1 or num_frames <= 2:
            curve = np.full(num_frames, self._sample_pitch(), dtype=np.float64)
        else:
            interior = np.sort(self.rng.uniform(0.0, 1.0, size=n_segments - 1))
            node_frames = np.concatenate(([0.0], interior * (num_frames - 1), [num_frames - 1.0]))
            node_pitch = np.array([self._sample_pitch() for _ in range(n_segments + 1)])
            curve = np.interp(np.arange(num_frames, dtype=np.float64), node_frames, node_pitch)

        depth_semitones = max(float(self.modulation.vibrato_semitones), 0.0)
        if depth_semitones > 0 and self.rng.random() < self.modulation.vibrato_probability:
            rate = float(self.rng.uniform(*self.modulation.vibrato_rate_range))
            frame_t = np.arange(num_frames, dtype=np.float64) * (self.frame_period / 1000.0)
            curve = curve * 2.0 ** (np.sin(2.0 * math.pi * rate * frame_t) * depth_semitones / 12.0)
        return curve

    # ------------------------------------------------------------------
    def _synthesize(self, f0_frames: np.ndarray, envelope: np.ndarray) -> np.ndarray:
        """Band-limited harmonic synthesis following the frame F0 curve."""
        num_frames = f0_frames.shape[0]
        n_samples = num_frames * self.hop_length
        # sample-rate F0 curve via linear interpolation between frame centres
        frame_pos = np.arange(num_frames) * self.hop_length
        sample_pos = np.arange(n_samples)
        f0_s = np.interp(sample_pos, frame_pos, f0_frames)

        phase = np.cumsum(2.0 * np.pi * f0_s / self.sample_rate)
        nyquist = self.sample_rate / 2.0
        min_f0 = max(float(np.min(f0_frames)), 1.0)
        n_harmonics = min(int(nyquist / min_f0), 80)

        freq_axis = np.linspace(0, nyquist, self.fft_size // 2 + 1)
        out = np.zeros(n_samples, dtype=np.float64)
        for k in range(1, n_harmonics + 1):
            hk = k * f0_s
            mask = hk < nyquist
            if not mask.any():
                break
            amp = np.interp(hk, freq_axis, envelope)
            out += np.where(mask, amp, 0.0) * np.sin(k * phase)
        peak = np.max(np.abs(out))
        if peak > 0:
            out = out / peak
        return out

    def _synthesize_partials(self, f0_frames: np.ndarray, partial_amps: np.ndarray) -> np.ndarray:
        """Sparse-partial synthesis: fixed per-harmonic amplitudes (1 partial
        = the eval suites' pure sine) instead of a formant envelope."""
        num_frames = f0_frames.shape[0]
        n_samples = num_frames * self.hop_length
        frame_pos = np.arange(num_frames) * self.hop_length
        f0_s = np.interp(np.arange(n_samples), frame_pos, f0_frames)
        phase = np.cumsum(2.0 * np.pi * f0_s / self.sample_rate)
        nyquist = self.sample_rate / 2.0
        out = np.zeros(n_samples, dtype=np.float64)
        for k, amp in enumerate(partial_amps, start=1):
            mask = k * f0_s < nyquist
            if not mask.any():
                break
            out += np.where(mask, float(amp), 0.0) * np.sin(k * phase)
        peak = np.max(np.abs(out))
        if peak > 0:
            out = out / peak
        return out

    def _sample_partial_set(self) -> np.ndarray:
        """1..tone_partials_max partials; single partial (pure tone) drawn
        most often, multi-partial sets get a random geometric rolloff."""
        n = int(self.rng.integers(1, self.tone_partials_max + 1))
        if n == 1:
            return np.ones(1)
        rolloff = float(self.rng.uniform(0.3, 0.8))
        return rolloff ** np.arange(n, dtype=np.float64)

    def generate(self) -> Tuple[np.ndarray, np.ndarray]:
        """-> (waveform float32, exact per-frame F0 float32)
        (reference Utils/synthetic.py:194-220)."""
        duration = self._sample_duration()
        num_frames = max(2, int(np.ceil((duration * 1000.0) / self.frame_period)))
        f0_curve = self._sample_f0_curve(num_frames)
        if self.tone_probability > 0 and self.rng.random() < self.tone_probability:
            waveform = self._synthesize_partials(f0_curve, self._sample_partial_set())
        else:
            template = self._templates[int(self.rng.integers(len(self._templates)))]
            waveform = self._synthesize(f0_curve, template)

        gain = _db_to_amplitude(float(self.rng.uniform(*self.params.gain_db)))
        waveform = waveform * gain
        if self.params.noise_db is not None:
            noise_gain = _db_to_amplitude(self.params.noise_db)
            if noise_gain > 0:
                waveform = waveform + self.rng.normal(scale=noise_gain, size=waveform.shape)
        return waveform.astype(np.float32), f0_curve.astype(np.float32)


# Back-compat alias mirroring the reference class name.
WorldSynthesizer = HarmonicSynthesizer
