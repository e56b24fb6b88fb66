"""Evaluation-side reference labeling, batched on device.

Role of the reference's ``Utils/f0_notebook_utils.py`` (keep eval reference
contours in lockstep with the training labeler cascade), redesigned around
this framework's batched extractor: an :class:`EvalLabeler` owns one
``F0Extractor`` built from the training config and labels *batches* of
waveforms in one device dispatch (``F0Extractor.compute_batch``), falling
back to the per-utterance cascade only for rows the primary backend could
not track.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..config import load_config
from ..dsp.resample import resample_np
from ..labels import BackendComputationError, build_f0_extractor


class EvalLabeler:
    """Training-cascade F0 labels for evaluation audio.

    Construct from a training config (or explicit mel/f0 params); call
    :meth:`contour` for one waveform or :meth:`contour_batch` for many.
    All audio is downmixed to mono and resampled to the cascade's sample
    rate internally; contours are aligned to ``target_frames`` with the
    cascade's zero-preserving interpolation and NaNs replaced by
    ``zero_fill_value`` — the same label policy the training data layer
    applies (reference meldataset.py:650-676).
    """

    def __init__(
        self,
        mel_params: Optional[Dict[str, Any]] = None,
        f0_params: Optional[Dict[str, Any]] = None,
        *,
        fallback_sr: int = 24000,
        fallback_hop: int = 300,
        zero_fill_value: float = 0.0,
        verbose: bool = False,
    ) -> None:
        mel_params = mel_params or {}
        self.sample_rate = int(mel_params.get("sample_rate", fallback_sr))
        self.hop_length = int(
            mel_params.get("hop_length", mel_params.get("hop_len", fallback_hop))
        )
        self.zero_fill_value = float(zero_fill_value)
        self.extractor = build_f0_extractor(
            self.sample_rate, self.hop_length, config=f0_params or {}, verbose=verbose
        )

    @classmethod
    def from_config(cls, config_path: Optional[str], **kwargs) -> "EvalLabeler":
        """Build from a training YAML so eval labels match training labels
        (the reference notebooks re-read the training config for the same
        reason, f0_notebook_utils.py:29-59)."""
        config: Dict[str, Any] = {}
        if config_path:
            try:
                config = load_config(str(config_path)) or {}
            except OSError:
                config = {}
        dataset_params = config.get("dataset_params") or {}
        return cls(
            mel_params=dataset_params.get("mel_params") or {},
            f0_params=dataset_params.get("f0_params") or {},
            **kwargs,
        )

    # ------------------------------------------------------------------
    def _prepare(self, audio: np.ndarray, sr: Optional[int]) -> np.ndarray:
        wave = np.asarray(audio, dtype=np.float32)
        if wave.ndim > 1:
            wave = np.mean(wave, axis=-1).astype(np.float32)
        if sr is not None and int(sr) != self.sample_rate:
            wave = resample_np(wave, int(sr), self.sample_rate)
        return wave

    def _finalize(self, f0: np.ndarray, target_frames: Optional[int]) -> np.ndarray:
        if target_frames is not None:
            f0 = self.extractor.align_length(f0, int(target_frames))
        return np.nan_to_num(np.asarray(f0, dtype=np.float32), nan=self.zero_fill_value)

    def contour(
        self,
        audio: np.ndarray,
        sr: Optional[int] = None,
        target_frames: Optional[int] = None,
    ) -> np.ndarray:
        """One waveform -> one frame-aligned contour (zeros on total
        labeler failure, like the training data layer)."""
        wave = self._prepare(audio, sr)
        try:
            f0 = self.extractor.compute(wave, self.sample_rate).f0
        except BackendComputationError:
            f0 = np.zeros((max(1 + len(wave) // self.hop_length, 1),), dtype=np.float32)
        return self._finalize(f0, target_frames)

    def contour_batch(
        self,
        audios: Sequence[np.ndarray],
        sr: Optional[int] = None,
        target_frames: Optional[int] = None,
    ) -> List[np.ndarray]:
        """Many waveforms -> contours via one batched device dispatch.

        Rows are zero-padded to the longest waveform for the dense batch;
        each returned contour is trimmed back to its row's true frame count
        (or aligned to ``target_frames`` when given).
        """
        waves = [self._prepare(a, sr) for a in audios]
        if not waves:
            return []
        longest = max(len(w) for w in waves)
        dense = np.zeros((len(waves), longest), dtype=np.float32)
        for i, w in enumerate(waves):
            dense[i, : len(w)] = w
        try:
            contours = self.extractor.compute_batch(dense, self.sample_rate)
        except (BackendComputationError, NotImplementedError, AttributeError):
            # cascade has no batch-capable primary: label row by row
            return [self.contour(w, None, target_frames) for w in waves]
        out: List[np.ndarray] = []
        frames_per_sample = contours.shape[1] / max(longest, 1)
        for i, w in enumerate(waves):
            true_frames = max(int(round(len(w) * frames_per_sample)), 1)
            row = contours[i, :true_frames]
            out.append(self._finalize(row, target_frames))
        return out
