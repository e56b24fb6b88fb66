"""SwiftF0-style spectrogram-CNN pitch estimator in flax.

Replaces the reference's ONNX-Runtime SwiftF0 backend (f0_backends.py:352-434).
The model contract matches the official package: 16 kHz input, STFT hop 256
(16 ms frames), a small CNN over a band-limited log-spectrogram patch, pitch
bins decoded with confidence thresholding.

Two architectures share the backend contract:

- **v1**: per-frame 1-D conv over linear-frequency bins (n_fft 1024).
  Round-1 finding (RESULTS.md): structurally weak below 150 Hz — at 15.6 Hz
  bin spacing a bass fundamental spans ~2 bins and pitch resolution collapses.
- **v2** (default for newly trained weights): log-frequency resampled input
  (pitch shifts become translations, so low octaves get the same treatment
  as high ones), a 2048-sample analysis window (7.8 Hz linear resolution
  feeding the log grid), and 2-D time×frequency convs (±3 frames of temporal
  context).  This is the round-2 fix for the low band (VERDICT #6).

Weights load from an ``.npz``; the ``format`` key selects the architecture.
Without weights the backend is unavailable — the cascade skips it just like
the reference skips a missing ``swift_f0`` package.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

import flax.linen as nn

from .base import BackendUnavailableError, packaged_weights_path
from ..dsp.resample import resample_np
from ..dsp.stft import stft_np

TARGET_SAMPLE_RATE = 16000
HOP_LENGTH = 256
N_FFT = 1024
# Band-limited input: bins covering ~46.9 Hz .. 2109 Hz (SwiftF0's useful range)
BIN_LO = 3
BIN_HI = 135
N_BINS_IN = BIN_HI - BIN_LO  # 132 spectrogram rows
PITCH_BINS = 200
FMIN_MODEL = 46.875
FMAX_MODEL = 2093.75


def _pitch_bin_frequencies() -> np.ndarray:
    """Log-spaced bin center frequencies."""
    return np.geomspace(FMIN_MODEL, FMAX_MODEL, PITCH_BINS).astype(np.float32)


# ---- v2: log-frequency front-end + 2-D time/frequency CNN ----------------
N_FFT_V2 = 2048
LOGF_BINS = 160
LOGF_MIN = 40.0
LOGF_MAX = 2100.0


def logf_filterbank(
    n_fft: int = N_FFT_V2,
    sr: int = TARGET_SAMPLE_RATE,
    n_bins: int = LOGF_BINS,
    fmin: float = LOGF_MIN,
    fmax: float = LOGF_MAX,
) -> np.ndarray:
    """(n_bins, n_fft//2+1) triangular filters on a log-frequency grid.

    Same construction as a mel filterbank but geometric centers; every row is
    normalised to unit sum, and rows narrower than one linear bin fall back
    to linear interpolation between the two straddling bins so no row is
    empty at the low end."""
    lin = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    centers = np.geomspace(fmin, fmax, n_bins)
    edges = np.concatenate(
        [[centers[0] * centers[0] / centers[1]], centers, [centers[-1] * centers[-1] / centers[-2]]]
    )
    fb = np.zeros((n_bins, lin.shape[0]), dtype=np.float32)
    for i in range(n_bins):
        lo, c, hi = edges[i], edges[i + 1], edges[i + 2]
        rising = (lin - lo) / max(c - lo, 1e-9)
        falling = (hi - lin) / max(hi - c, 1e-9)
        tri = np.clip(np.minimum(rising, falling), 0.0, None)
        if tri.sum() <= 0:  # triangle narrower than one linear bin
            j = np.searchsorted(lin, c)
            j = min(max(j, 1), lin.shape[0] - 1)
            w = (c - lin[j - 1]) / max(lin[j] - lin[j - 1], 1e-9)
            tri[j - 1], tri[j] = 1.0 - w, w
        fb[i] = tri / tri.sum()
    return fb


class SwiftF0ModelV2(nn.Module):
    """2-D CNN over (B, T, LOGF_BINS) log-frequency patches -> per-frame bins.

    Time-axis kernels give ±3 frames (≈±48 ms) of context; frequency pooling
    only, so the frame rate is preserved."""

    @nn.compact
    def __call__(self, x):
        h = x[..., None]  # (B, T, F, 1)
        for i, (ch, tw, fw) in enumerate([(32, 3, 7), (64, 3, 5), (128, 3, 3)]):
            h = nn.Conv(ch, kernel_size=(tw, fw), padding="SAME", name=f"conv{i + 1}")(h)
            h = nn.relu(h)
            h = nn.max_pool(h, window_shape=(1, 2), strides=(1, 2))
        B, T, Fr, C = h.shape
        h = h.reshape((B, T, Fr * C))
        h = nn.relu(nn.Dense(256, name="fc1")(h))
        return nn.Dense(PITCH_BINS, name="fc2")(h)


class SwiftF0Model(nn.Module):
    """Small conv net over (B, T, N_BINS_IN) log-spectrogram -> per-frame bins."""

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F) -> treat F as the spatial axis with conv1d over it,
        # per-frame (time is the batch-like axis).
        B, T, F = x.shape
        h = x.reshape((B * T, F, 1))
        for i, (ch, w) in enumerate([(32, 7), (64, 5), (128, 3)]):
            h = nn.Conv(ch, kernel_size=(w,), padding="SAME", name=f"conv{i + 1}")(h)
            h = nn.relu(h)
            h = nn.max_pool(h, window_shape=(2,), strides=(2,))
        h = h.reshape((B * T, -1))
        h = nn.Dense(256, name="fc1")(h)
        h = nn.relu(h)
        logits = nn.Dense(PITCH_BINS, name="fc2")(h)
        return logits.reshape((B, T, PITCH_BINS))


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def _forward(apply_fn, variables, spec):
    logits = apply_fn(variables, spec)
    probs = jax.nn.softmax(logits, axis=-1)
    freqs = jnp.asarray(_pitch_bin_frequencies())
    center = jnp.argmax(probs, axis=-1)
    confidence = jnp.max(probs, axis=-1)
    # local weighted average in log-frequency space (±2 bins)
    offsets = jnp.arange(-2, 3)
    idx = jnp.clip(center[..., None] + offsets, 0, PITCH_BINS - 1)
    p = jnp.take_along_axis(probs, idx, axis=-1)
    logf = jnp.log(freqs)[idx]
    f0 = jnp.exp(jnp.sum(p * logf, axis=-1) / jnp.maximum(jnp.sum(p, axis=-1), 1e-12))
    return f0, confidence


class SwiftF0Labeler:
    def __init__(
        self,
        weights_path: Optional[str] = None,
        confidence_threshold: Optional[float] = 0.9,
        fmin: Optional[float] = None,
        fmax: Optional[float] = None,
    ) -> None:
        self.confidence_threshold = (
            0.9 if confidence_threshold is None else float(confidence_threshold)
        )
        self.fmin = FMIN_MODEL if fmin is None else max(float(fmin), FMIN_MODEL)
        self.fmax = FMAX_MODEL if fmax is None else min(float(fmax), FMAX_MODEL)

        if weights_path is None:
            weights_path = os.environ.get("PEX_SWIFTF0_WEIGHTS")
        if weights_path is None:
            weights_path = packaged_weights_path("swiftf0_v2.npz") or packaged_weights_path(
                "swiftf0.npz"
            )
        if not weights_path or not os.path.isfile(str(weights_path)):
            raise BackendUnavailableError(
                f"SwiftF0 weights not found (weights_path={weights_path!r}); "
                "train them with tools/train_swiftf0.py or set "
                "PEX_SWIFTF0_WEIGHTS"
            )
        self.variables, self.format, self.calibration = load_swiftf0_weights(
            str(weights_path)
        )
        self.model = SwiftF0ModelV2() if self.format == 2 else SwiftF0Model()
        self._logf_fb = logf_filterbank() if self.format == 2 else None

    def _patch(self, waveform: np.ndarray) -> np.ndarray:
        """Waveform (16 kHz) -> (1, T, F) model input patch."""
        if self.format == 2:
            spec = np.abs(
                stft_np(waveform, n_fft=N_FFT_V2, hop_length=HOP_LENGTH, win_length=N_FFT_V2)
            ).astype(np.float32)
            return np.log(self._logf_fb @ spec + 1e-8).T[None, ...]
        spec = np.abs(
            stft_np(waveform, n_fft=N_FFT, hop_length=HOP_LENGTH, win_length=N_FFT)
        ).astype(np.float32)
        return np.log(spec[BIN_LO:BIN_HI, :].T + 1e-8)[None, ...]

    def detect(
        self, waveform: np.ndarray, sr: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (pitch_hz, confidence, voicing) at the model frame rate."""
        waveform = np.asarray(waveform, dtype=np.float32).reshape(-1)
        if sr != TARGET_SAMPLE_RATE:
            waveform = resample_np(waveform, sr, TARGET_SAMPLE_RATE)
        patch = self._patch(waveform)
        f0, confidence = _forward(self.model.apply, self.variables, jnp.asarray(patch))
        f0 = np.asarray(f0[0], dtype=np.float64)
        confidence = np.asarray(confidence[0], dtype=np.float64)
        if self.calibration is not None:
            # Self-trained weights learn against Gaussian-smoothed targets,
            # capping the raw softmax peak well below 1.0 (sigma=2 bins caps
            # it near 0.2).  The stored logistic map rescales to the official
            # swift_f0 confidence range so the reference default threshold
            # (0.9, Configs/config.yml) keeps its meaning.
            c0, s = self.calibration
            confidence = 1.0 / (1.0 + np.exp(-(confidence - c0) / s))
        voicing = (
            (confidence >= self.confidence_threshold)
            & (f0 >= self.fmin)
            & (f0 <= self.fmax)
        )
        return f0, confidence, voicing

    def detect_batch(
        self, waveforms: np.ndarray, sr: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(B, samples) equal-length -> (B, frames) pitch/confidence/voicing:
        every utterance's spectrogram patch goes through the CNN in one
        apply (per-row dispatch round trips dominate over remote
        transports)."""
        batch = np.asarray(waveforms, dtype=np.float32)
        if batch.ndim == 1:
            batch = batch[None, :]
        if sr != TARGET_SAMPLE_RATE:
            batch = np.stack([resample_np(row, sr, TARGET_SAMPLE_RATE) for row in batch])
        patches = np.concatenate([self._patch(row) for row in batch], axis=0)
        f0, confidence = _forward(self.model.apply, self.variables, jnp.asarray(patches))
        f0 = np.asarray(f0, dtype=np.float64)
        confidence = np.asarray(confidence, dtype=np.float64)
        if self.calibration is not None:
            c0, s = self.calibration
            confidence = 1.0 / (1.0 + np.exp(-(confidence - c0) / s))
        voicing = (
            (confidence >= self.confidence_threshold)
            & (f0 >= self.fmin)
            & (f0 <= self.fmax)
        )
        return f0, confidence, voicing


def load_swiftf0_weights(path: str):
    """-> (variables, format, calibration).

    format 1 = v1 (1-D conv), 2 = v2.  calibration is ``(c0, s)`` for the
    logistic confidence map or ``None`` (raw softmax peak, pre-calibration
    weight files)."""
    data = np.load(path)
    fmt = int(data["format"]) if "format" in data.files else 1
    params = {}
    for name in ("conv1", "conv2", "conv3", "fc1", "fc2"):
        params[name] = {
            "kernel": jnp.asarray(data[f"{name}.kernel"]),
            "bias": jnp.asarray(data[f"{name}.bias"]),
        }
    calibration = None
    if "conf_c0" in data.files and "conf_s" in data.files:
        calibration = (float(data["conf_c0"]), float(data["conf_s"]))
    return {"params": params}, fmt, calibration


def save_swiftf0_weights(path: str, variables, fmt: int = 1, calibration=None) -> None:
    arrays = {"format": np.asarray(fmt, dtype=np.int32)}
    for name, leaf in variables["params"].items():
        arrays[f"{name}.kernel"] = np.asarray(leaf["kernel"])
        arrays[f"{name}.bias"] = np.asarray(leaf["bias"])
    if calibration is not None:
        arrays["conf_c0"] = np.asarray(calibration[0], dtype=np.float32)
        arrays["conf_s"] = np.asarray(calibration[1], dtype=np.float32)
    np.savez(path, **arrays)
