"""Pitch accuracy metrics.

Canonical definitions from the reference eval suite
(Utils/dynamic_pitch_tools.py:79-136 and the notebook ``compute_metrics``,
dynamic_pitch_behavior.ipynb cell 5; SURVEY.md §2.13):

- RPA: |cents diff| <= 50 on reference-voiced frames
- RCA: circular (mod 1200) cents distance <= 50
- VUV: frame-wise voicing agreement accuracy
- OctaveError: off by an exact non-zero octave (+-50 cents)
- RMSE_cents, Lag_ms (cross-correlation), Overshoot_cents

Cents are referenced to 55 Hz, voicing decision is ``prediction >
voicing_threshold_hz`` (10 Hz in the notebooks).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

CENTS_REF_HZ = 55.0
DEFAULT_VOICING_THRESHOLD_HZ = 10.0


def hz_to_cents(f0: np.ndarray) -> np.ndarray:
    """(reference Utils/dynamic_pitch_tools.py:79-83)"""
    f0 = np.asarray(f0)
    cents = np.zeros_like(f0, dtype=np.float32)
    positive = f0 > 0
    cents[positive] = 1200.0 * np.log2(f0[positive] / CENTS_REF_HZ)
    return cents


def circular_cents_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(reference Utils/dynamic_pitch_tools.py:86-89)"""
    diff = a - b
    return np.mod(diff + 600.0, 1200.0) - 600.0


def compute_metrics(
    reference: np.ndarray,
    prediction: np.ndarray,
    voicing_threshold_hz: float = DEFAULT_VOICING_THRESHOLD_HZ,
    tolerance_cents: float = 50.0,
) -> Dict[str, float]:
    """RPA/RCA/VUV/OctaveError (notebook ``compute_metrics``)."""
    length = min(reference.shape[0], prediction.shape[0])
    reference = np.asarray(reference[:length], dtype=np.float64)
    prediction = np.asarray(prediction[:length], dtype=np.float64)
    ref_voiced = reference > 0
    pred_voiced = prediction > voicing_threshold_hz
    total_frames = length
    voiced_frames = int(np.count_nonzero(ref_voiced))
    vuv_accuracy = float(np.count_nonzero(ref_voiced == pred_voiced) / max(total_frames, 1))
    if voiced_frames == 0:
        return {
            "RPA": float("nan"),
            "RCA": float("nan"),
            "VUV": vuv_accuracy,
            "OctaveError": float("nan"),
        }
    ref_cents = hz_to_cents(reference[ref_voiced])
    pred_cents = hz_to_cents(np.clip(prediction[ref_voiced], a_min=1e-5, a_max=None))
    cents_diff = pred_cents - ref_cents
    rpa_hits = np.abs(cents_diff) <= tolerance_cents
    chroma_diff = circular_cents_distance(pred_cents, ref_cents)
    rca_hits = np.abs(chroma_diff) <= tolerance_cents
    octave_candidates = np.abs(cents_diff) > tolerance_cents
    octave_numbers = np.round(cents_diff / 1200.0)
    octave_errors = (
        octave_candidates
        & (octave_numbers != 0)
        & (np.abs(cents_diff - octave_numbers * 1200.0) <= tolerance_cents)
    )
    return {
        "RPA": float(np.count_nonzero(rpa_hits) / voiced_frames),
        "RCA": float(np.count_nonzero(rca_hits) / voiced_frames),
        "VUV": vuv_accuracy,
        "OctaveError": float(np.count_nonzero(octave_errors) / voiced_frames),
    }


def rms_cents_error(reference: np.ndarray, prediction: np.ndarray) -> float:
    """(reference Utils/dynamic_pitch_tools.py:92-104)"""
    length = min(reference.shape[0], prediction.shape[0])
    if length == 0:
        return float("nan")
    ref = np.asarray(reference[:length], dtype=np.float64)
    pred = np.asarray(prediction[:length], dtype=np.float64)
    mask = ref > 0
    if not np.any(mask):
        return float("nan")
    ref_cents = hz_to_cents(ref[mask])
    pred_cents = hz_to_cents(np.clip(pred[mask], a_min=1e-5, a_max=None))
    diff = pred_cents - ref_cents
    return float(np.sqrt(np.mean(diff**2)))


def estimate_tracking_delay_ms(
    reference: np.ndarray, prediction: np.ndarray, frame_period_ms: float
) -> float:
    """(reference Utils/dynamic_pitch_tools.py:107-123)"""
    length = min(reference.shape[0], prediction.shape[0])
    if length == 0:
        return float("nan")
    ref = np.asarray(reference[:length], dtype=np.float64)
    pred = np.asarray(prediction[:length], dtype=np.float64)
    ref_centered = ref - np.mean(ref)
    pred_centered = pred - np.mean(pred)
    if np.allclose(ref_centered, 0) or np.allclose(pred_centered, 0):
        return float("nan")
    corr = np.correlate(pred_centered, ref_centered, mode="full")
    lag = np.argmax(corr) - (length - 1)
    return float(lag * frame_period_ms)


def compute_overshoot_cents(reference: np.ndarray, prediction: np.ndarray) -> float:
    """(reference Utils/dynamic_pitch_tools.py:126-136)"""
    length = min(reference.shape[0], prediction.shape[0])
    if length == 0:
        return float("nan")
    ref = np.asarray(reference[:length], dtype=np.float64)
    pred = np.asarray(prediction[:length], dtype=np.float64)
    target = ref[-1]
    peak = np.max(pred) if pred.size else 0.0
    if target <= 0 or peak <= 0:
        return float("nan")
    return float(1200.0 * np.log2(peak / target))
