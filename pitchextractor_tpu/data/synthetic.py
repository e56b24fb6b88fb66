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
from typing import Dict, List, Optional, Sequence, Tuple

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


@dataclass
class ModulationConfig:
    vibrato_probability: float = 0.6
    vibrato_semitones: float = 0.35
    vibrato_rate_range: Tuple[float, float] = (4.0, 7.0)
    max_segments: int = 4


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

        cfg = dict(config or {})
        duration_cfg = cfg.get("duration", {}) or {}
        self.min_duration = float(duration_cfg.get("min", 0.5))
        self.max_duration = float(duration_cfg.get("max", 1.8))
        if self.max_duration <= 0:
            raise ValueError("Synthetic duration must be positive")

        pitch_range = cfg.get("pitch_range", [110.0, 320.0])
        if len(pitch_range) != 2:
            raise ValueError("pitch_range must contain two values")
        self.pitch_min = float(min(pitch_range))
        self.pitch_max = float(max(pitch_range))
        # log-uniform pitch sampling (off by default: the reference samples
        # uniform in Hz, Utils/synthetic.py:157; labeler self-training turns
        # this on so every octave gets equal coverage)
        self.pitch_log_uniform = bool(cfg.get("pitch_log_uniform", False))

        noise_db_cfg = cfg.get("noise_db", -60.0)
        self.noise_db = None if noise_db_cfg is None else float(noise_db_cfg)
        gain_cfg = cfg.get("gain_db_range", [-18.0, -6.0])
        if isinstance(gain_cfg, (int, float)):
            gain_cfg = [gain_cfg, gain_cfg]
        if len(gain_cfg) != 2:
            raise ValueError("gain_db_range must provide two values")
        gain_min, gain_max = float(gain_cfg[0]), float(gain_cfg[1])
        if gain_min > gain_max:
            gain_min, gain_max = gain_max, gain_min
        self.gain_db_range = (gain_min, gain_max)
        self.modulation = ModulationConfig(**(cfg.get("modulation", {}) or {}))

        vowel_profiles = cfg.get("vowel_profiles") or DEFAULT_VOWELS
        self._templates = self._build_formant_templates(vowel_profiles)
        self.frame_period = 1000.0 * self.hop_length / self.sample_rate

        # Pure-tone / sparse-partial stimuli (round-2 domain-gap fix): the
        # eval suites drive single-partial sines and few-partial timbres
        # (reference Utils/dynamic_pitch_tools.py:21-62, pitch-range notebook
        # partial sets), which are spectrally unlike the formant vowels; with
        # probability ``tone_probability`` a sample is synthesised from a
        # sparse partial set (1 = pure sine) instead of a vowel envelope.
        self.tone_probability = float(cfg.get("tone_probability", 0.0))
        self.tone_partials_max = max(1, int(cfg.get("tone_partials_max", 4)))

    # ------------------------------------------------------------------
    def _build_formant_templates(self, profiles: Sequence[Dict]) -> List[np.ndarray]:
        """Gaussian-bump spectral envelopes on the FFT frequency axis
        (reference Utils/synthetic.py:122-147)."""
        freq_axis = np.linspace(0, self.sample_rate / 2, self.fft_size // 2 + 1)
        templates: List[np.ndarray] = []
        for profile in profiles:
            formants = profile.get("formants", [])
            if not formants:
                continue
            envelope = np.zeros_like(freq_axis)
            for formant in formants:
                if len(formant) < 2:
                    continue
                freq = float(formant[0])
                bandwidth = float(formant[1])
                amplitude = float(formant[2]) if len(formant) > 2 else 1.0
                if bandwidth <= 0:
                    bandwidth = 60.0
                envelope += amplitude * np.exp(
                    -0.5 * ((freq_axis - freq) / (bandwidth / 2.0)) ** 2
                )
            envelope = np.maximum(envelope, 1e-3)
            templates.append(envelope.astype(np.float64))
        if not templates:
            raise ValueError("No valid vowel templates provided for synthesis")
        return templates

    # ------------------------------------------------------------------
    def _sample_duration(self) -> float:
        if self.max_duration <= self.min_duration:
            return max(self.max_duration, 0.1)
        return float(self.rng.uniform(self.min_duration, self.max_duration))

    def _sample_pitch(self) -> float:
        if self.pitch_log_uniform:
            return float(
                np.exp(self.rng.uniform(np.log(self.pitch_min), np.log(self.pitch_max)))
            )
        return float(self.rng.uniform(self.pitch_min, self.pitch_max))

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

        gain = _db_to_amplitude(float(self.rng.uniform(*self.gain_db_range)))
        waveform = waveform * gain
        if self.noise_db is not None:
            noise_gain = _db_to_amplitude(self.noise_db)
            if noise_gain > 0:
                waveform = waveform + self.rng.normal(scale=noise_gain, size=waveform.shape)
        return waveform.astype(np.float32), f0_curve.astype(np.float32)


# Back-compat alias mirroring the reference class name.
WorldSynthesizer = HarmonicSynthesizer
