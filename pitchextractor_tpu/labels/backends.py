"""Concrete F0 backends.

Backend types and their reference counterparts (SURVEY.md §2.6, §2.12):

- ``jax_ac``      NEW, TPU-native default: batched autocorrelation + Viterbi
                  tracker (labels/trackers.py).  Replaces the role of the
                  reference's pyworld harvest/dio default chain
                  (f0_backends.py:637-640) with an on-device program.
- ``pyworld``     host compatibility wrapper with the reference's
                  algorithm/fallback/stonemask semantics
                  (f0_backends.py:109-148); unavailable when pyworld is not
                  installed — the cascade then skips it, exactly like the
                  reference skips missing optional deps.
- ``crepe``       CREPE CNN re-implemented in flax and jitted on TPU
                  (labels/crepe.py); weights load from ``weights_path``
                  (npz).  Replaces torchcrepe (f0_backends.py:151-349).
- ``swiftf0``     SwiftF0-style STFT+CNN in flax (labels/swiftf0.py);
                  replaces the ONNX Runtime backend (f0_backends.py:352-434).
- ``praat`` / ``parselmouth``  host Praat wrappers, gated on parselmouth
                  (f0_backends.py:437-584).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .base import BackendComputationError, BackendUnavailableError, BaseF0Backend
from .trackers import TrackerParams, track_pitch, track_pitch_batch


def bucket_length(length: int, sr: int, bucket_seconds: float, linear_cap_seconds: float = 8.0) -> int:
    """Padded length for shape bucketing.

    Linear 1-bucket granularity up to ``linear_cap_seconds`` (fine-grained,
    few shapes), geometric ×2 buckets beyond it — so audio of any duration
    maps onto O(log) compiled shapes instead of one per distinct second.
    """
    if bucket_seconds <= 0:
        return length
    bucket = max(int(bucket_seconds * sr), 1)
    padded = ((length + bucket - 1) // bucket) * bucket
    cap = int(linear_cap_seconds * sr)
    if padded <= cap:
        return padded
    size = cap
    while size < length:
        size *= 2
    return size


def _pad_to_bucket(waveform: np.ndarray, sr: int, bucket_seconds: float) -> np.ndarray:
    """Zero-pad onto the bucketed shape grid so arbitrary file lengths map
    onto a bounded set of compiled tracker shapes (each distinct shape is one
    XLA compilation).  The caller trims the contour back to the true frame
    count."""
    padded_len = bucket_length(waveform.shape[-1], sr, bucket_seconds)
    if padded_len == waveform.shape[-1]:
        return waveform
    pad = padded_len - waveform.shape[-1]
    if waveform.ndim == 1:
        return np.pad(waveform, (0, pad))
    return np.pad(waveform, ((0, 0), (0, pad)))


_DEQUANT_I16 = None


def _as_f32_waveform_device(audio):
    """Dequantize a device-placed waveform batch to float32 on device.

    int16 rides the host->device wire at half the bytes (labels/bulk.py's
    pipelined upload); the 1/32768 scale makes the round trip exact for
    samples that came from 16-bit PCM decode (io/audio.py divides by 32768).
    The jitted dequant is cached at module level — a per-call ``jax.jit``
    wrapper would recompile every batch (round-3 bench regression).
    """
    global _DEQUANT_I16
    import jax.numpy as jnp

    if hasattr(audio, "dtype") and audio.dtype == jnp.int16:
        if _DEQUANT_I16 is None:
            import jax

            _DEQUANT_I16 = jax.jit(lambda x: x.astype(jnp.float32) * (1.0 / 32768.0))
        return _DEQUANT_I16(audio)
    return audio


class JaxACBackend(BaseF0Backend):
    """TPU-native autocorrelation/Viterbi tracker (the framework default)."""

    backend_type = "jax_ac"
    requires_accelerator = True
    supports_device_batch = True

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.bucket_seconds = self._coerce_float("bucket_seconds", 1.0)
        self.params = TrackerParams(
            min_pitch=self._coerce_float("min_pitch", 40.0),
            max_pitch=self._coerce_float("max_pitch", 1100.0),
            silence_threshold=self._coerce_float("silence_threshold", 0.03),
            voicing_threshold=self._coerce_float("voicing_threshold", 0.45),
            octave_cost=self._coerce_float("octave_cost", 0.01),
            octave_jump_cost=self._coerce_float("octave_jump_cost", 0.35),
            voiced_unvoiced_cost=self._coerce_float("voiced_unvoiced_cost", 0.14),
            periods_per_window=self._coerce_float("periods_per_window", 3.0),
            max_candidates=int(self.config.get("max_candidates", 15) or 15),
        )

    def _hop_for(self, sr: int) -> int:
        return max(1, int(round(self.frame_period_ms * sr / 1000.0)))

    def compute(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        sr = int(sr or self.sample_rate)
        waveform = np.asarray(audio, dtype=np.float32).reshape(-1)
        if waveform.size == 0:
            return np.zeros((0,), dtype=np.float64)
        hop = self._hop_for(sr)
        true_frames = 1 + waveform.shape[0] // hop
        padded = _pad_to_bucket(waveform, sr, self.bucket_seconds)
        try:
            f0 = track_pitch(padded, sr, hop, self.params)
        except Exception as exc:  # pragma: no cover - defensive
            raise BackendComputationError(f"jax_ac tracking failed: {exc}") from exc
        f0 = f0[:true_frames]
        self.log(f"jax_ac analysed {f0.shape[0]} frames at sr={sr}.")
        return f0.astype(np.float64)

    def compute_batch(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        sr = int(sr or self.sample_rate)
        batch = np.asarray(audio, dtype=np.float32)
        if batch.ndim == 1:
            batch = batch[None, :]
        hop = self._hop_for(sr)
        true_frames = 1 + batch.shape[1] // hop
        padded = _pad_to_bucket(batch, sr, self.bucket_seconds)
        out = track_pitch_batch(padded, sr, hop, self.params)
        return np.asarray(out, dtype=np.float64)[:, :true_frames]

    def compute_batch_device(self, audio, sr: Optional[int] = None):
        """Device-in/device-out batched tracking (no host sync).

        ``audio`` must already be bucket-padded (the caller owns the compile
        key); frames past ``1 + samples // hop`` are padding artifacts the
        caller trims after fetch."""
        sr = int(sr or self.sample_rate)
        return track_pitch_batch(
            _as_f32_waveform_device(audio), sr, self._hop_for(sr), self.params
        )


class JaxYinBackend(BaseF0Backend):
    """Batched YIN (de Cheveigné & Kawahara 2002) on TPU.

    A cheaper alternative to ``jax_ac`` — no Viterbi pass; the cumulative
    mean-normalized difference threshold decides voicing per frame.
    """

    backend_type = "jax_yin"
    requires_accelerator = True
    supports_device_batch = True

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.fmin = self._coerce_float("fmin", 40.0)
        self.fmax = self._coerce_float("fmax", 1100.0)
        self.threshold = self._coerce_float("threshold", 0.15)
        self.bucket_seconds = self._coerce_float("bucket_seconds", 1.0)

    def compute(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        return self.compute_batch(np.asarray(audio).reshape(1, -1), sr)[0]

    def compute_batch(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        from .yin import yin_batch

        sr = int(sr or self.sample_rate)
        hop = max(1, int(round(self.frame_period_ms * sr / 1000.0)))
        batch = np.asarray(audio, dtype=np.float32)
        if batch.ndim == 1:
            batch = batch[None, :]
        true_frames = 1 + batch.shape[1] // hop
        padded = _pad_to_bucket(batch, sr, self.bucket_seconds)
        out = yin_batch(padded, sr, hop, self.fmin, self.fmax, self.threshold)
        return np.asarray(out, dtype=np.float64)[:, :true_frames]

    def compute_batch_device(self, audio, sr: Optional[int] = None):
        from .yin import yin_batch

        sr = int(sr or self.sample_rate)
        hop = max(1, int(round(self.frame_period_ms * sr / 1000.0)))
        return yin_batch(
            _as_f32_waveform_device(audio), sr, hop, self.fmin, self.fmax, self.threshold
        )


class JaxPyinBackend(JaxYinBackend):
    """Batched pYIN (Mauch & Dixon 2014) on TPU.

    YIN's CMND with a beta prior over voicing thresholds and a pitch-bin HMM
    Viterbi decode (labels/yin.py ``pyin_batch``) — probabilistic voicing
    instead of ``jax_yin``'s single fixed threshold.  No reference
    counterpart; fills the smoothed-classical-tracker role of Praat's
    ac+Viterbi path (f0_backends.py:437-578) with an on-device program.
    """

    backend_type = "jax_pyin"

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.cents_per_bin = self._coerce_float("cents_per_bin", 20.0)
        self.switch_prob = self._coerce_float("switch_prob", 0.01)
        self.max_step_cents = self._coerce_float("max_step_cents", 450.0)
        self.beta_a = self._coerce_float("beta_a", 2.0)
        self.beta_b = self._coerce_float("beta_b", 18.0)

    def compute_batch(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        from .yin import pyin_batch

        sr = int(sr or self.sample_rate)
        hop = max(1, int(round(self.frame_period_ms * sr / 1000.0)))
        batch = np.asarray(audio, dtype=np.float32)
        if batch.ndim == 1:
            batch = batch[None, :]
        true_frames = 1 + batch.shape[1] // hop
        padded = _pad_to_bucket(batch, sr, self.bucket_seconds)
        out = pyin_batch(
            padded,
            sr,
            hop,
            fmin=self.fmin,
            fmax=self.fmax,
            cents_per_bin=self.cents_per_bin,
            switch_prob=self.switch_prob,
            max_step_cents=self.max_step_cents,
            beta_a=self.beta_a,
            beta_b=self.beta_b,
        )
        return np.asarray(out, dtype=np.float64)[:, :true_frames]

    def compute_batch_device(self, audio, sr: Optional[int] = None):
        from .yin import pyin_batch

        sr = int(sr or self.sample_rate)
        hop = max(1, int(round(self.frame_period_ms * sr / 1000.0)))
        return pyin_batch(
            _as_f32_waveform_device(audio),
            sr,
            hop,
            fmin=self.fmin,
            fmax=self.fmax,
            cents_per_bin=self.cents_per_bin,
            switch_prob=self.switch_prob,
            max_step_cents=self.max_step_cents,
            beta_a=self.beta_a,
            beta_b=self.beta_b,
        )


class PyWorldBackend(BaseF0Backend):
    """Host pyworld wrapper (reference f0_backends.py:109-148)."""

    backend_type = "pyworld"

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        try:
            import pyworld as pw  # type: ignore
        except ImportError as exc:
            raise BackendUnavailableError("pyworld is not installed") from exc
        self._pw = pw
        self.algorithm = self.config.get("algorithm", "harvest")
        self.fallback_algorithm = self.config.get("fallback", "dio")
        self.use_stonemask = bool(self.config.get("stonemask", True))

    def _run_algorithm(self, algorithm: str, audio: np.ndarray, sr: int):
        frame_period = self.frame_period_ms
        if algorithm == "harvest":
            return self._pw.harvest(audio, sr, frame_period=frame_period)
        if algorithm == "dio":
            return self._pw.dio(audio, sr, frame_period=frame_period)
        if algorithm == "stonemask":
            f0, t = self._pw.harvest(audio, sr, frame_period=frame_period)
            return self._pw.stonemask(audio, f0, t, sr), t
        raise ValueError(f"Unsupported PyWorld algorithm: {algorithm}")

    def compute(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        sr = int(sr or self.sample_rate)
        signal = np.asarray(audio).astype("double", copy=False)
        algorithm = self.algorithm
        f0, t = self._run_algorithm(algorithm, signal, sr)
        min_voiced = int(self.config.get("min_voiced_frames", 5))
        if np.count_nonzero(f0) < min_voiced and self.fallback_algorithm:
            self.log(
                f"Primary algorithm '{algorithm}' returned too few voiced frames; "
                f"switching to '{self.fallback_algorithm}'."
            )
            f0, t = self._run_algorithm(self.fallback_algorithm, signal, sr)
        if self.use_stonemask and algorithm != "stonemask":
            f0 = self._pw.stonemask(signal, f0, t, sr)
        return f0.astype(np.float64)


class DioStyleBackend(BaseF0Backend):
    """In-tree dio-style tracker (labels/dio.py) — the executable equivalent
    of the reference's default ``harvest``→``dio`` chain
    (reference f0_backends.py:109-148) for images without pyworld.

    Host/numpy by design (see labels/dio.py); config schema accepts both the
    framework's ``fmin``/``fmax`` and WORLD's ``f0_floor``/``f0_ceil`` names.
    """

    backend_type = "dio"

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.fmin = self._coerce_float(
            "fmin", self._coerce_float("f0_floor", 40.0)
        )
        self.fmax = self._coerce_float(
            "fmax", self._coerce_float("f0_ceil", 800.0)
        )
        self.bands_per_octave = int(self.config.get("bands_per_octave", 2) or 2)
        self.reliability_threshold = self._coerce_float("reliability_threshold", 0.12)
        # stonemask-style refinement (reference f0_backends.py:126-147
        # applies pw.stonemask to every harvest/dio contour); off by
        # default here so round-4 dio caches stay valid — when enabled the
        # cache key grows an ``-sm`` suffix (see cache_key)
        from .registry import coerce_enabled_flag

        self.use_stonemask = coerce_enabled_flag(self.config.get("stonemask", False))

    @property
    def cache_key(self) -> str:
        base = super().cache_key
        return f"{base}-sm" if self.use_stonemask else base

    def compute(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        from .dio import dio_style_track

        sr = int(sr or self.sample_rate)
        waveform = np.asarray(audio, dtype=np.float64).reshape(-1)
        if waveform.size == 0:
            raise BackendComputationError("dio: empty audio")
        hop = max(1, int(round(self.frame_period_ms * sr / 1000.0)))
        try:
            f0 = dio_style_track(
                waveform,
                sr,
                hop,
                fmin=self.fmin,
                fmax=self.fmax,
                bands_per_octave=self.bands_per_octave,
                reliability_threshold=self.reliability_threshold,
            )
        except BackendComputationError:
            raise
        except Exception as exc:  # pragma: no cover - defensive
            raise BackendComputationError(f"dio tracking failed: {exc}") from exc
        if self.use_stonemask:
            from .stonemask import stonemask_refine

            f0 = stonemask_refine(waveform, sr, hop, f0)
        self.log(f"dio analysed {f0.shape[0]} frames at sr={sr}.")
        return f0.astype(np.float64)


class HarvestStyleBackend(BaseF0Backend):
    """In-tree harvest-style tracker (labels/harvest.py) — the executable
    equivalent of the FIRST stage of the reference's default
    ``harvest``→``dio`` chain (reference f0_backends.py:109-148,
    DEFAULT_SEQUENCE :637-640) for images without pyworld.

    Host/numpy by design (see labels/harvest.py); config schema accepts
    both the framework's ``fmin``/``fmax`` and WORLD's
    ``f0_floor``/``f0_ceil`` names, mirroring DioStyleBackend.
    """

    backend_type = "harvest"

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.fmin = self._coerce_float(
            "fmin", self._coerce_float("f0_floor", 40.0)
        )
        self.fmax = self._coerce_float(
            "fmax", self._coerce_float("f0_ceil", 800.0)
        )
        self.candidates_per_octave = int(self.config.get("candidates_per_octave", 12) or 12)
        self.deviation_threshold = self._coerce_float("deviation_threshold", 0.07)
        self.min_voiced_frames = int(self.config.get("min_voiced_frames", 3) or 3)
        self.max_gap_frames = int(self.config.get("max_gap_frames", 12) or 12)
        from .registry import coerce_enabled_flag

        self.use_stonemask = coerce_enabled_flag(self.config.get("stonemask", False))

    @property
    def cache_key(self) -> str:
        base = super().cache_key
        return f"{base}-sm" if self.use_stonemask else base

    def compute(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        from .harvest import harvest_style_track

        sr = int(sr or self.sample_rate)
        waveform = np.asarray(audio, dtype=np.float64).reshape(-1)
        if waveform.size == 0:
            raise BackendComputationError("harvest: empty audio")
        hop = max(1, int(round(self.frame_period_ms * sr / 1000.0)))
        try:
            f0 = harvest_style_track(
                waveform,
                sr,
                hop,
                fmin=self.fmin,
                fmax=self.fmax,
                candidates_per_octave=self.candidates_per_octave,
                deviation_threshold=self.deviation_threshold,
                min_voiced_frames=self.min_voiced_frames,
                max_gap_frames=self.max_gap_frames,
            )
        except BackendComputationError:
            raise
        except Exception as exc:  # pragma: no cover - defensive
            raise BackendComputationError(f"harvest tracking failed: {exc}") from exc
        if self.use_stonemask:
            from .stonemask import stonemask_refine

            f0 = stonemask_refine(waveform, sr, hop, f0)
        self.log(f"harvest analysed {f0.shape[0]} frames at sr={sr}.")
        return f0.astype(np.float64)


class PraatACBackend(BaseF0Backend):
    """In-tree Boersma-style autocorrelation tracker (labels/praat_ac.py) —
    the executable equivalent of the reference's Praat backend
    (reference f0_backends.py:437-578, ``Sound.to_pitch_ac``) for images
    without parselmouth.

    Config schema mirrors the knobs the reference passes to
    ``to_pitch_ac``: ``min_pitch``/``max_pitch``, ``silence_threshold``,
    ``voicing_threshold``, ``octave_cost``, ``octave_jump_cost``,
    ``voiced_unvoiced_cost``.
    """

    backend_type = "praat_ac"

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.min_pitch = self._coerce_float("min_pitch", self._coerce_float("fmin", 40.0))
        self.max_pitch = self._coerce_float("max_pitch", self._coerce_float("fmax", 800.0))
        self.silence_threshold = self._coerce_float("silence_threshold", 0.03)
        self.voicing_threshold = self._coerce_float("voicing_threshold", 0.45)
        self.octave_cost = self._coerce_float("octave_cost", 0.01)
        self.octave_jump_cost = self._coerce_float("octave_jump_cost", 0.35)
        self.voiced_unvoiced_cost = self._coerce_float("voiced_unvoiced_cost", 0.14)

    def compute(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        from .praat_ac import praat_ac_track

        sr = int(sr or self.sample_rate)
        waveform = np.asarray(audio, dtype=np.float64).reshape(-1)
        if waveform.size == 0:
            raise BackendComputationError("praat_ac: empty audio")
        hop = max(1, int(round(self.frame_period_ms * sr / 1000.0)))
        try:
            f0 = praat_ac_track(
                waveform,
                sr,
                hop,
                min_pitch=self.min_pitch,
                max_pitch=self.max_pitch,
                silence_threshold=self.silence_threshold,
                voicing_threshold=self.voicing_threshold,
                octave_cost=self.octave_cost,
                octave_jump_cost=self.octave_jump_cost,
                voiced_unvoiced_cost=self.voiced_unvoiced_cost,
            )
        except BackendComputationError:
            raise
        except Exception as exc:  # pragma: no cover - defensive
            raise BackendComputationError(f"praat_ac tracking failed: {exc}") from exc
        self.log(f"praat_ac analysed {f0.shape[0]} frames at sr={sr}.")
        return f0.astype(np.float64)


class CrepeBackend(BaseF0Backend):
    """CREPE CNN in flax, batched on TPU (reference f0_backends.py:151-349).

    Weights load from ``weights_path`` (npz produced by
    ``tools/convert_crepe_weights.py``).  Missing weights make the backend
    unavailable — analogous to the reference's missing-torchcrepe case.
    """

    backend_type = "crepe"
    requires_accelerator = True

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        from .crepe import CrepeLabeler, CREPE_CAPACITIES

        self.model = str(self.config.get("model", "full"))
        if self.model not in CREPE_CAPACITIES:
            raise ValueError(f"Unknown CREPE capacity '{self.model}'")
        self.step_size_ms = self._coerce_float("step_size_ms", self.frame_period_ms)
        self.fmin = self._coerce_float("fmin", 50.0)
        self.fmax = self._coerce_float("fmax", 1100.0)
        self.batch_size = int(self.config.get("batch_size", 1024) or 1024)
        self.return_periodicity = bool(self.config.get("return_periodicity", True))
        self.periodicity_threshold = self._coerce_float("periodicity_threshold", 0.1)
        self.use_median_filter = int(self.config.get("median_filter_size", 0) or 0)
        if self.use_median_filter < 0:
            raise ValueError("median_filter_size must be >= 0")

        weights_path = self.config.get("weights_path")
        self._labeler = CrepeLabeler(
            capacity=self.model,
            weights_path=weights_path,
            fmin=self.fmin,
            fmax=self.fmax,
        )

    def compute(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        sr = int(sr or self.sample_rate)
        waveform = np.asarray(audio, dtype=np.float32).reshape(-1)
        hop = max(1, int(round(self.step_size_ms * sr / 1000.0)))
        f0, periodicity = self._labeler.predict(waveform, sr, hop)
        if self.use_median_filter > 1:
            from .filters import median_filter_1d

            f0 = median_filter_1d(f0, self.use_median_filter)
            periodicity = median_filter_1d(periodicity, self.use_median_filter)
        f0 = f0.astype(np.float64)
        if self.return_periodicity and self.periodicity_threshold > 0:
            f0[periodicity < self.periodicity_threshold] = 0.0
        self.log(
            "CREPE analysed %d frames with mean periodicity %.3f."
            % (f0.shape[0], float(periodicity.mean()) if periodicity.size else 0.0)
        )
        return f0

    def compute_batch(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        """One CNN apply for the whole batch (all utterances' windows share
        the batch axis) instead of the base class's per-row loop."""
        sr = int(sr or self.sample_rate)
        batch = np.asarray(audio, dtype=np.float32)
        if batch.ndim == 1:
            batch = batch[None, :]
        hop = max(1, int(round(self.step_size_ms * sr / 1000.0)))
        f0, periodicity = self._labeler.predict_batch(batch, sr, hop)
        if self.use_median_filter > 1:
            from .filters import median_filter_1d

            f0 = np.stack([median_filter_1d(row, self.use_median_filter) for row in f0])
        f0 = f0.astype(np.float64)
        if self.return_periodicity and self.periodicity_threshold > 0:
            f0[periodicity < self.periodicity_threshold] = 0.0
        return f0


class SwiftF0Backend(BaseF0Backend):
    """SwiftF0-style STFT+CNN labeler in flax (reference f0_backends.py:352-434)."""

    backend_type = "swiftf0"
    requires_accelerator = True

    # SwiftF0's model operates at 16 kHz with hop 256 (16 ms frames); the
    # reference exposes that as the default frame period for cache
    # consistency (f0_backends.py:367-371).
    TARGET_SAMPLE_RATE = 16000
    HOP_LENGTH = 256

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        model_frame_period_ms = 1000.0 * self.HOP_LENGTH / self.TARGET_SAMPLE_RATE
        self.config.setdefault("frame_period_ms", model_frame_period_ms)

        from .swiftf0 import SwiftF0Labeler

        def _maybe_float(key):
            value = self.config.get(key)
            if value is None:
                return None
            try:
                return float(value)
            except (TypeError, ValueError) as exc:
                raise ValueError(
                    f"Invalid float value for '{key}' in SwiftF0 backend: {value!r}"
                ) from exc

        self.confidence_threshold = _maybe_float("confidence_threshold")
        self.fmin = _maybe_float("fmin")
        self.fmax = _maybe_float("fmax")
        self.zero_unvoiced = bool(self.config.get("zero_unvoiced", True))
        unvoiced_value = self.config.get("unvoiced_value", 0.0)
        try:
            self.unvoiced_value = float(0.0 if unvoiced_value is None else unvoiced_value)
        except (TypeError, ValueError) as exc:
            raise ValueError(
                f"Invalid float value for 'unvoiced_value' in SwiftF0 backend: "
                f"{unvoiced_value!r}"
            ) from exc

        self._labeler = SwiftF0Labeler(
            weights_path=self.config.get("weights_path"),
            confidence_threshold=self.confidence_threshold,
            fmin=self.fmin,
            fmax=self.fmax,
        )

    def compute(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        sr = int(sr or self.sample_rate)
        waveform = np.asarray(audio, dtype=np.float32).reshape(-1)
        try:
            f0, confidence, voicing = self._labeler.detect(waveform, sr)
        except BackendUnavailableError:
            raise
        except Exception as exc:  # pragma: no cover - defensive
            raise BackendComputationError(f"SwiftF0 failed to compute F0: {exc}") from exc
        f0 = np.asarray(f0, dtype=np.float64)
        mean_conf = float(np.mean(confidence)) if confidence.size else 0.0
        self.log(f"SwiftF0 analysed {f0.size} frames with mean confidence {mean_conf:.3f}.")
        if self.zero_unvoiced and voicing.size:
            f0 = f0.copy()
            f0[~voicing.astype(bool)] = self.unvoiced_value
        return f0

    def compute_batch(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        """One CNN apply for the whole batch (base class loops per row)."""
        sr = int(sr or self.sample_rate)
        batch = np.asarray(audio, dtype=np.float32)
        if batch.ndim == 1:
            batch = batch[None, :]
        try:
            f0, _confidence, voicing = self._labeler.detect_batch(batch, sr)
        except BackendUnavailableError:
            raise
        except Exception as exc:  # pragma: no cover - defensive
            raise BackendComputationError(f"SwiftF0 failed to compute F0: {exc}") from exc
        f0 = np.asarray(f0, dtype=np.float64)
        if self.zero_unvoiced and voicing.size:
            f0 = f0.copy()
            f0[~voicing.astype(bool)] = self.unvoiced_value
        return f0


class PraatBackend(BaseF0Backend):
    """Host Praat wrapper via parselmouth (reference f0_backends.py:437-578).

    Full reference config surface: ``method`` resolves "ac"/"cc" to the
    dedicated autocorrelation/cross-correlation entry points, anything else
    through parselmouth's ToPitchMethod enum; ``unit`` selects the field of
    ``selected_array`` with case/alias fallbacks.
    """

    backend_type = "praat"

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        try:
            import parselmouth  # type: ignore
        except ImportError as exc:
            raise BackendUnavailableError(
                "parselmouth (Praat bindings) is not installed"
            ) from exc
        self._parselmouth = parselmouth
        self.min_pitch = self._coerce_float("min_pitch", 40.0)
        self.max_pitch = self._coerce_float("max_pitch", 1100.0)
        self.silence_threshold = self._coerce_float("silence_threshold", 0.03)
        self.voicing_threshold = self._coerce_float("voicing_threshold", 0.45)
        self.octave_cost = self._coerce_float("octave_cost", 0.01)
        self.octave_jump_cost = self._coerce_float("octave_jump_cost", 1.0)
        self.voiced_unvoiced_cost = self._coerce_float("voiced_unvoiced_cost", 0.3)
        self.pitch_unit = self.config.get("unit", "Hertz")
        from .registry import coerce_enabled_flag

        self.very_accurate = coerce_enabled_flag(self.config.get("very_accurate", False))
        self._raw_method = self.config.get("method")
        self._method_key = self._normalise_method(self._raw_method)

    @staticmethod
    def _normalise_method(method_value) -> Optional[str]:
        """(reference f0_backends.py:460-467)"""
        import re

        if method_value is None:
            return None
        text = str(method_value).strip().lower()
        if not text:
            return None
        return re.sub(r"[^a-z0-9]+", "", text)

    def _resolve_method_enum(self, method_value):
        """(reference f0_backends.py:469-492)"""
        import re

        if method_value is None:
            return None
        enum_cls = getattr(self._parselmouth.Sound, "ToPitchMethod", None)
        if enum_cls is None:
            return None
        if isinstance(method_value, enum_cls):  # pragma: no cover - defensive
            return method_value
        method_key = self._normalise_method(method_value)
        if method_key is None:
            return None
        for attr in dir(enum_cls):
            if attr.startswith("_"):
                continue
            try:
                candidate = getattr(enum_cls, attr)
            except AttributeError:  # pragma: no cover - defensive
                continue
            if not isinstance(candidate, enum_cls):
                continue
            if method_key == re.sub(r"[^a-z0-9]+", "", attr.lower()):
                return candidate
        return None

    def _select_unit(self, selected) -> np.ndarray:
        """Unit-key lookup with case/alias fallbacks
        (reference f0_backends.py:533-578)."""
        unit_key = self.pitch_unit or "Hertz"
        candidate_keys = []
        if isinstance(unit_key, str):
            candidate_keys.extend(
                [unit_key, unit_key.lower(), unit_key.upper(), unit_key.capitalize()]
            )
            if unit_key.lower() == "hertz":
                candidate_keys.append("frequency")
        else:
            candidate_keys.extend(["Hertz", "frequency"])
        seen = set()
        candidate_keys = [k for k in candidate_keys if not (k in seen or seen.add(k))]

        last_error = None
        for key in candidate_keys:
            try:
                return np.asarray(selected[key], dtype=np.float64)
            except Exception as exc:  # pragma: no cover - passthrough
                last_error = exc
                continue
        available = []
        dtype = getattr(selected, "dtype", None)
        if getattr(dtype, "names", None):
            available = list(dtype.names)
        detail = (
            f"Available fields: {available!r}. Last error: {last_error}"
            if available or last_error
            else ""
        )
        raise ValueError(f"Unsupported Praat pitch unit '{self.pitch_unit}'. {detail}")

    def compute(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        sr = int(sr or self.sample_rate)
        sound = self._parselmouth.Sound(np.asarray(audio), sampling_frequency=sr)
        time_step = self.frame_period_ms / 1000.0
        kwargs = dict(
            time_step=time_step,
            pitch_floor=self.min_pitch,
            pitch_ceiling=self.max_pitch,
            very_accurate=self.very_accurate,
            silence_threshold=self.silence_threshold,
            voicing_threshold=self.voicing_threshold,
            octave_cost=self.octave_cost,
            octave_jump_cost=self.octave_jump_cost,
            voiced_unvoiced_cost=self.voiced_unvoiced_cost,
        )
        if self._method_key in {"ac", "autocorrelation"}:
            pitch = sound.to_pitch_ac(**kwargs)
        elif self._method_key in {"cc", "crosscorrelation"}:
            pitch = sound.to_pitch_cc(**kwargs)
        else:
            method_enum = self._resolve_method_enum(self._raw_method)
            generic_kwargs = dict(
                time_step=time_step,
                pitch_floor=self.min_pitch,
                pitch_ceiling=self.max_pitch,
            )
            if method_enum is not None:
                generic_kwargs["method"] = method_enum
            pitch = sound.to_pitch(**generic_kwargs)
        return self._select_unit(pitch.selected_array)


class ParselmouthBackend(PraatBackend):
    """Alias backend (reference f0_backends.py:581-584)."""

    backend_type = "parselmouth"


class JDCBackend(BaseF0Backend):
    """The trained JDCNet itself as a labeling backend (new capability).

    Closes the self-training loop: the round-2 flagship out-tracks the
    classical cascade it was bootstrapped from (model vs exact truth RPA
    0.978 / 0.0% octave flips vs jax_ac 0.905 / 3.8% on dense-harmonic
    vowels — RESULTS.md), so later corpora can be labeled by the model.
    The reference has no analog (its labelers are all external packages,
    f0_backends.py:587-593).

    Config: ``checkpoint`` (path, or a run dir whose newest epoch_*.ckpt is
    used; required), ``voicing_threshold_hz`` (default 10.0, the notebooks'
    eval rule), ``octave_correction`` (default off), ``batch_size`` cap for
    the batched path.
    """

    backend_type = "jdc"
    requires_accelerator = True

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        checkpoint = self.config.get("checkpoint") or self.config.get("checkpoint_dir")
        if not checkpoint:
            raise BackendUnavailableError(
                "jdc backend needs a 'checkpoint' (file or run dir) in its config"
            )
        import os as _os

        from ..infer import F0Predictor, latest_checkpoint, load_model

        if _os.path.isdir(str(checkpoint)):
            checkpoint = latest_checkpoint(str(checkpoint))
        if not checkpoint or not _os.path.isfile(str(checkpoint)):
            raise BackendUnavailableError(
                f"jdc backend checkpoint not found: {self.config.get('checkpoint')!r}"
            )
        self._checkpoint_path = str(checkpoint)
        try:
            model, variables = load_model(self._checkpoint_path)
        except Exception as exc:
            raise BackendUnavailableError(f"jdc checkpoint failed to load: {exc}") from exc
        self._predictor = F0Predictor(
            model,
            variables,
            voicing_threshold_hz=self._coerce_float("voicing_threshold_hz", 10.0),
            octave_correction=bool(self.config.get("octave_correction", False)),
        )
        self.batch_size = int(self.config.get("batch_size", 64) or 64)

    @property
    def cache_key(self) -> str:
        suffix = self.config.get("cache_key_suffix")
        if suffix:
            return f"{self.name}-{suffix}"
        # labels change with the checkpoint: key on its basename
        import os as _os

        stem = _os.path.splitext(_os.path.basename(self._checkpoint_path))[0]
        return f"{self.name}-{stem}"

    def _to_native_sr(self, audio: np.ndarray, sr: int) -> np.ndarray:
        waveform = np.asarray(audio, dtype=np.float32).reshape(-1)
        if sr != self._predictor.sample_rate:
            from ..dsp import resample_np

            waveform = resample_np(waveform, sr, self._predictor.sample_rate)
        return waveform

    def compute(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        sr = int(sr or self.sample_rate)
        waveform = self._to_native_sr(audio, sr)
        if waveform.size == 0:
            return np.zeros((0,), dtype=np.float64)
        try:
            f0, voiced = self._predictor.predict(waveform)
        except Exception as exc:
            raise BackendComputationError(f"jdc inference failed: {exc}") from exc
        f0 = np.where(voiced, f0, 0.0)
        self.log(f"jdc labeled {f0.shape[0]} frames from {self._checkpoint_path}.")
        return np.asarray(f0, dtype=np.float64)

    def compute_batch(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        sr = int(sr or self.sample_rate)
        batch = np.asarray(audio, dtype=np.float32)
        if batch.ndim == 1:
            batch = batch[None, :]
        rows = [self._to_native_sr(row, sr) for row in batch]
        out = []
        for lo in range(0, len(rows), self.batch_size):
            out.extend(self._predictor.predict_f0_batch(rows[lo : lo + self.batch_size]))
        thr = self._predictor.voicing_threshold_hz
        contours = [np.where(np.asarray(c) > thr, np.asarray(c), 0.0) for c in out]
        n = max(len(c) for c in contours)
        dense = np.zeros((len(contours), n), dtype=np.float64)
        for i, c in enumerate(contours):
            dense[i, : len(c)] = c
        return dense
