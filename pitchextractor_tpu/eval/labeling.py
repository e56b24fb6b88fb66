"""Shared helpers for evaluation-side F0 labeling.

Port of the reference ``Utils/f0_notebook_utils.py``: keeps evaluation
reference-contours in lockstep with the training labeler cascade (same
extractor construction, resampling, length alignment, NaN policy).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import load_config
from ..dsp.resample import resample_np
from ..labels import BackendComputationError, build_f0_extractor


@dataclass
class EvalF0Result:
    """(reference Utils/f0_notebook_utils.py:23-26)"""

    f0: np.ndarray
    backend_name: str


def load_training_config(config_path: Optional[str]) -> Dict[str, Any]:
    """(reference Utils/f0_notebook_utils.py:29-39)"""
    if config_path is None:
        return {}
    path = Path(config_path)
    if not path.is_file():
        return {}
    return load_config(str(path)) or {}


def resolve_dataset_params(training_config: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """(reference Utils/f0_notebook_utils.py:42-46)"""
    dataset_params = training_config.get("dataset_params", {}) if training_config else {}
    mel_params = dataset_params.get("mel_params", {}) if dataset_params else {}
    f0_params = dataset_params.get("f0_params", {}) if dataset_params else {}
    return dict(mel_params), dict(f0_params)


def build_eval_f0_extractor(
    mel_params: Dict[str, Any],
    f0_params: Dict[str, Any],
    *,
    fallback_sr: int,
    fallback_hop: int,
    verbose: bool = False,
):
    """(reference Utils/f0_notebook_utils.py:49-59)"""
    sample_rate = int(mel_params.get("sample_rate", fallback_sr))
    hop_length = int(mel_params.get("hop_length", mel_params.get("hop_len", fallback_hop)))
    return build_f0_extractor(sample_rate, hop_length, config=f0_params, verbose=verbose)


def ensure_mono(audio: np.ndarray) -> np.ndarray:
    """(reference Utils/f0_notebook_utils.py:62-67)"""
    audio = np.asarray(audio)
    if audio.ndim == 0:
        return audio.reshape(-1)
    if audio.ndim == 1:
        return audio
    return np.mean(audio, axis=1)


def resample_audio(audio: np.ndarray, source_sr: int, target_sr: int) -> np.ndarray:
    """(reference Utils/f0_notebook_utils.py:70-75)"""
    if source_sr == target_sr:
        return np.asarray(audio)
    return resample_np(np.asarray(audio, dtype=np.float32), source_sr, target_sr)


def compute_f0_for_eval(
    audio: np.ndarray,
    sr: int,
    extractor,
    *,
    target_frames: Optional[int] = None,
    zero_fill_value: float = 0.0,
) -> EvalF0Result:
    """(reference Utils/f0_notebook_utils.py:78-107)"""
    waveform = ensure_mono(np.asarray(audio, dtype=np.float32))
    target_sr = extractor.sample_rate
    if sr != target_sr:
        waveform = resample_audio(waveform, sr, target_sr)
        sr = target_sr
    try:
        result = extractor.compute(waveform, sr=sr)
        f0 = result.f0
        backend_name = result.backend_name
    except BackendComputationError as exc:
        f0 = np.zeros((0,), dtype=np.float32)
        backend_name = ""
        print(f"Warning: all F0 backends failed ({exc}). Returning zeros.")
    if target_frames is not None:
        f0 = extractor.align_length(f0, target_frames)
    if np.any(np.isnan(f0)):
        f0 = np.nan_to_num(f0, nan=zero_fill_value)
    return EvalF0Result(f0=np.asarray(f0, dtype=np.float32), backend_name=backend_name)
