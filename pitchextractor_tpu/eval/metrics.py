"""Pitch accuracy metrics, vectorized over contour batches.

Metric *definitions* follow the reference eval suite (the notebook
``compute_metrics`` in Utils/dynamic_pitch_behavior.ipynb cell 5 and
Utils/dynamic_pitch_tools.py:79-136; SURVEY.md §2.13):

- RPA: |cents diff| <= tolerance on reference-voiced frames
- RCA: circular (mod 1200) cents distance <= tolerance
- VUV: frame-wise voicing agreement accuracy
- OctaveError: off by an exact non-zero octave (± tolerance)
- RMSE_cents; Lag_ms (argmax cross-correlation × frame period);
  Overshoot_cents (peak past the final target, glide suite)

The *implementation* is batch-first: every metric is computed for (N, T)
reference/prediction stacks in one masked vectorized pass (no per-row
Python, no boolean fancy-indexing), so a whole sweep's contours — produced
by one batched device dispatch — score in one call.  Scalar wrappers keep
the single-contour API.

Cents are referenced to 55 Hz; the eval voicing rule is
``prediction > voicing_threshold_hz`` (10 Hz in the notebooks).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

CENTS_REF_HZ = 55.0
DEFAULT_VOICING_THRESHOLD_HZ = 10.0


def hz_to_cents(f0: np.ndarray) -> np.ndarray:
    """Cents re 55 Hz; exact zeros (unvoiced) stay zero."""
    f0 = np.asarray(f0, dtype=np.float64)
    return np.where(f0 > 0, 1200.0 * np.log2(np.maximum(f0, 1e-12) / CENTS_REF_HZ), 0.0).astype(
        np.float32
    )


def circular_cents_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Chroma distance folded to (-600, 600]."""
    return np.mod(np.asarray(a) - np.asarray(b) + 600.0, 1200.0) - 600.0


def _as_batch(reference: np.ndarray, prediction: np.ndarray):
    """Align shapes: -> (N, T) float64 pairs truncated to the common T."""
    ref = np.asarray(reference, dtype=np.float64)
    pred = np.asarray(prediction, dtype=np.float64)
    squeeze = ref.ndim == 1
    if squeeze:
        ref, pred = ref[None, :], pred[None, :]
    t = min(ref.shape[1], pred.shape[1])
    return ref[:, :t], pred[:, :t], squeeze


def batch_metrics(
    reference: np.ndarray,
    prediction: np.ndarray,
    voicing_threshold_hz: float = DEFAULT_VOICING_THRESHOLD_HZ,
    tolerance_cents: float = 50.0,
) -> Dict[str, np.ndarray]:
    """(N, T) stacks -> {'RPA','RCA','VUV','OctaveError','RMSE_cents'}: (N,).

    Rows with no reference-voiced frames get NaN accuracy (their VUV is
    still defined), matching the reference's empty-voiced behavior.
    """
    ref, pred, _ = _as_batch(reference, prediction)
    n, t = ref.shape
    if t == 0:
        nan = np.full((n,), np.nan)
        return {"RPA": nan, "RCA": nan.copy(), "VUV": nan.copy(),
                "OctaveError": nan.copy(), "RMSE_cents": nan.copy()}

    voiced = ref > 0  # (N, T) mask; all statistics below are masked means
    n_voiced = voiced.sum(axis=1)  # (N,)
    denom = np.maximum(n_voiced, 1)

    vuv = np.mean(voiced == (pred > voicing_threshold_hz), axis=1)

    diff = hz_to_cents(np.clip(pred, 1e-5, None)).astype(np.float64) - hz_to_cents(
        ref
    ).astype(np.float64)
    abs_diff = np.abs(diff)
    chroma = np.abs(np.mod(diff + 600.0, 1200.0) - 600.0)
    octaves = np.round(diff / 1200.0)
    is_octave = (
        (abs_diff > tolerance_cents)
        & (octaves != 0)
        & (np.abs(diff - octaves * 1200.0) <= tolerance_cents)
    )

    def masked_rate(hits):
        return np.where(n_voiced > 0, (hits & voiced).sum(axis=1) / denom, np.nan)

    rmse = np.where(
        n_voiced > 0,
        np.sqrt(np.sum(np.where(voiced, diff**2, 0.0), axis=1) / denom),
        np.nan,
    )
    return {
        "RPA": masked_rate(abs_diff <= tolerance_cents),
        "RCA": masked_rate(chroma <= tolerance_cents),
        "VUV": vuv,
        "OctaveError": masked_rate(is_octave),
        "RMSE_cents": rmse,
    }


def batch_tracking_delay_ms(
    reference: np.ndarray, prediction: np.ndarray, frame_period_ms: float
) -> np.ndarray:
    """(N, T) -> (N,) lag estimates via FFT cross-correlation (one batched
    transform instead of N host np.correlate loops)."""
    ref, pred, _ = _as_batch(reference, prediction)
    n, t = ref.shape
    if t == 0:
        return np.full((n,), np.nan)
    rc = ref - ref.mean(axis=1, keepdims=True)
    pc = pred - pred.mean(axis=1, keepdims=True)
    degenerate = (np.abs(rc).max(axis=1) < 1e-12) | (np.abs(pc).max(axis=1) < 1e-12)
    size = 2 * t - 1
    nfft = 1 << (size - 1).bit_length()
    corr = np.fft.irfft(
        np.fft.rfft(pc, nfft, axis=1) * np.conj(np.fft.rfft(rc, nfft, axis=1)), nfft, axis=1
    )
    # lags -(t-1)..(t-1): index the circular correlation accordingly
    lags = np.concatenate([np.arange(-(t - 1), 0) % nfft, np.arange(0, t)])
    ordered = corr[:, lags]
    lag = ordered.argmax(axis=1) - (t - 1)
    return np.where(degenerate, np.nan, lag * float(frame_period_ms))


def batch_overshoot_cents(reference: np.ndarray, prediction: np.ndarray) -> np.ndarray:
    """(N, T) -> (N,) overshoot of the prediction peak past the reference's
    final target (glide suite)."""
    ref, pred, _ = _as_batch(reference, prediction)
    if ref.shape[1] == 0:
        return np.full((ref.shape[0],), np.nan)
    target = ref[:, -1]
    peak = pred.max(axis=1)
    valid = (target > 0) & (peak > 0)
    safe = 1200.0 * np.log2(np.maximum(peak, 1e-12) / np.maximum(target, 1e-12))
    return np.where(valid, safe, np.nan)


# --------------------------------------------------------- scalar wrappers
def compute_metrics(
    reference: np.ndarray,
    prediction: np.ndarray,
    voicing_threshold_hz: float = DEFAULT_VOICING_THRESHOLD_HZ,
    tolerance_cents: float = 50.0,
) -> Dict[str, float]:
    """Single-contour RPA/RCA/VUV/OctaveError (notebook ``compute_metrics``)."""
    out = batch_metrics(reference, prediction, voicing_threshold_hz, tolerance_cents)
    return {k: float(out[k][0]) for k in ("RPA", "RCA", "VUV", "OctaveError")}


def rms_cents_error(reference: np.ndarray, prediction: np.ndarray) -> float:
    return float(batch_metrics(reference, prediction)["RMSE_cents"][0])


def estimate_tracking_delay_ms(
    reference: np.ndarray, prediction: np.ndarray, frame_period_ms: float
) -> float:
    return float(batch_tracking_delay_ms(reference, prediction, frame_period_ms)[0])


def compute_overshoot_cents(reference: np.ndarray, prediction: np.ndarray) -> float:
    return float(batch_overshoot_cents(reference, prediction)[0])
