"""CREPE pitch estimator (Kim et al. 2018) re-implemented in flax for TPU.

Replaces the reference's torchcrepe backend (f0_backends.py:151-349).  The
network operates on 1024-sample frames of 16 kHz audio, per-frame normalized,
through six conv→BN→ReLU→maxpool blocks into a 360-way sigmoid over 20-cent
pitch bins.  Decoding uses the weighted-argmax over a local window, and the
maximum bin activation is the periodicity/confidence signal — matching
torchcrepe's semantics so the ``periodicity_threshold`` config key behaves the
same.

The whole wav→contour path (resample → frame → CNN → decode) is one jitted
program; batches of frames stream through the MXU in bf16-friendly shapes.

Weights load from an ``.npz`` file (see ``tools/convert_crepe_weights.py`` for
the torchcrepe/keras converter).  Without weights the backend reports itself
unavailable, mirroring the reference's missing-dependency behaviour.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import logging

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import flax.linen as nn

from .base import BackendUnavailableError, packaged_weights_path
from ..dsp.resample import resample_np

LOGGER = logging.getLogger(__name__)

CREPE_SAMPLE_RATE = 16000
CREPE_WINDOW = 1024
CREPE_BINS = 360
CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191  # cents of bin 0 relative to 10 Hz

# capacity multiplier per model size (torchcrepe/crepe convention)
CREPE_CAPACITIES = {"tiny": 4, "small": 8, "medium": 16, "large": 24, "full": 32}

_FILTERS = [32, 4, 4, 4, 8, 16]
_WIDTHS = [512, 64, 64, 64, 64, 64]
_STRIDES = [4, 1, 1, 1, 1, 1]


def bins_to_cents(bins):
    return CENTS_PER_BIN * bins + CENTS_OFFSET


def cents_to_frequency(cents):
    return 10.0 * 2.0 ** (cents / 1200.0)


def frequency_to_cents(freq):
    return 1200.0 * jnp.log2(freq / 10.0)


class CrepeModel(nn.Module):
    """The CREPE CNN over (B, 1024) normalized frames -> (B, 360) logits."""

    capacity: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # (B, 1024) -> (B, 1024, 1)
        h = x[..., None]
        for i, (f, w, s) in enumerate(zip(_FILTERS, _WIDTHS, _STRIDES)):
            ch = f * self.capacity
            # 'same'-style padding as in crepe: pad so out = ceil(in / stride)
            h = nn.Conv(
                features=ch,
                kernel_size=(w,),
                strides=(s,),
                padding=[(w // 2, w // 2 - (1 - w % 2))],
                use_bias=True,
                name=f"conv{i + 1}",
            )(h)
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-3,
                name=f"bn{i + 1}",
            )(h)
            h = nn.relu(h)
            h = nn.max_pool(h, window_shape=(2,), strides=(2,))
        h = h.reshape((h.shape[0], -1))
        logits = nn.Dense(CREPE_BINS, name="classifier")(h)
        return logits


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def _forward_frames(apply_fn, variables, frames):
    # per-frame normalization (crepe convention): zero mean, unit std
    mean = jnp.mean(frames, axis=-1, keepdims=True)
    std = jnp.maximum(jnp.std(frames, axis=-1, keepdims=True), 1e-10)
    frames = (frames - mean) / std
    logits = apply_fn(variables, frames, train=False)
    return jax.nn.sigmoid(logits)


@functools.partial(jax.jit, static_argnames=())
def _decode_weighted_argmax(probs, fmin_cents, fmax_cents):
    """torchcrepe-style local weighted argmax decode.

    probs: (B, 360) -> (f0_hz, periodicity) each (B,).
    """
    bins = jnp.arange(CREPE_BINS, dtype=jnp.float32)
    cents_axis = bins_to_cents(bins)
    in_range = (cents_axis >= fmin_cents) & (cents_axis <= fmax_cents)
    masked = jnp.where(in_range[None, :], probs, -1.0)

    center = jnp.argmax(masked, axis=-1)  # (B,)
    periodicity = jnp.take_along_axis(probs, center[:, None], axis=-1)[:, 0]

    # window of ±4 bins around the peak
    offsets = jnp.arange(-4, 5)
    idx = jnp.clip(center[:, None] + offsets[None, :], 0, CREPE_BINS - 1)
    local_probs = jnp.take_along_axis(probs, idx, axis=-1)
    local_cents = bins_to_cents(idx.astype(jnp.float32))
    cents = jnp.sum(local_probs * local_cents, axis=-1) / jnp.maximum(
        jnp.sum(local_probs, axis=-1), 1e-12
    )
    f0 = cents_to_frequency(cents)
    return f0, periodicity


class CrepeLabeler:
    """Stateful wrapper: weights + jitted inference over framed audio."""

    def __init__(
        self,
        capacity: str = "full",
        weights_path: Optional[str] = None,
        fmin: float = 50.0,
        fmax: float = 1100.0,
    ) -> None:
        self.fmin = float(fmin)
        self.fmax = float(fmax)

        if weights_path is None:
            weights_path = os.environ.get("PEX_CREPE_WEIGHTS")
        if weights_path is None:
            weights_path = packaged_weights_path(f"crepe_{capacity}.npz")
            if not weights_path or not os.path.isfile(str(weights_path)):
                # Fall back to the largest packaged capacity below the
                # request (the reference's torchcrepe ships every size;
                # this build ships self-trained small/tiny — a user asking
                # for 'full' gets the best available instead of a skip).
                order = list(CREPE_CAPACITIES)
                for cand in reversed(order[: order.index(capacity) + 1]):
                    cand_path = packaged_weights_path(f"crepe_{cand}.npz")
                    if cand_path and os.path.isfile(str(cand_path)):
                        LOGGER.warning(
                            "CREPE '%s' weights not packaged; falling back to "
                            "packaged '%s' weights (%s)",
                            capacity,
                            cand,
                            cand_path,
                        )
                        capacity = cand
                        weights_path = cand_path
                        break
        if not weights_path or not os.path.isfile(str(weights_path)):
            raise BackendUnavailableError(
                f"CREPE '{capacity}' weights not found "
                f"(weights_path={weights_path!r}); convert them with "
                "tools/convert_crepe_weights.py or set PEX_CREPE_WEIGHTS"
            )
        self.capacity_name = capacity
        self.capacity = CREPE_CAPACITIES[capacity]
        self.model = CrepeModel(capacity=self.capacity)
        self.variables = load_crepe_weights(str(weights_path), self.capacity)

    def predict(
        self, waveform: np.ndarray, sr: int, hop_length: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """1-D waveform -> (f0_hz, periodicity) at ``hop_length`` (input sr)."""
        waveform = np.asarray(waveform, dtype=np.float32).reshape(-1)
        if sr != CREPE_SAMPLE_RATE:
            # express the hop in model samples to keep the frame times aligned
            hop_model = max(1, int(round(hop_length * CREPE_SAMPLE_RATE / sr)))
            waveform = resample_np(waveform, sr, CREPE_SAMPLE_RATE)
        else:
            hop_model = hop_length

        frames = _frame_audio(waveform, hop_model)
        probs = _forward_frames(self.model.apply, self.variables, jnp.asarray(frames))
        f0, periodicity = _decode_weighted_argmax(
            probs,
            frequency_to_cents(jnp.float32(self.fmin)),
            frequency_to_cents(jnp.float32(self.fmax)),
        )
        return np.asarray(f0, dtype=np.float64), np.asarray(periodicity, dtype=np.float64)

    def predict_batch(
        self, waveforms: np.ndarray, sr: int, hop_length: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, samples) equal-length waveforms -> (B, frames) f0/periodicity.

        All utterances' analysis windows run through the CNN in ONE apply
        (B*n_frames becomes the batch axis) — the per-utterance path costs a
        dispatch round trip per file, which dominates over remote transports.
        """
        batch = np.asarray(waveforms, dtype=np.float32)
        if batch.ndim == 1:
            batch = batch[None, :]
        if sr != CREPE_SAMPLE_RATE:
            hop_model = max(1, int(round(hop_length * CREPE_SAMPLE_RATE / sr)))
            batch = np.stack([resample_np(row, sr, CREPE_SAMPLE_RATE) for row in batch])
        else:
            hop_model = hop_length
        frames = np.stack([_frame_audio(row, hop_model) for row in batch])
        B, T, W = frames.shape
        probs = _forward_frames(
            self.model.apply, self.variables, jnp.asarray(frames.reshape(B * T, W))
        )
        f0, periodicity = _decode_weighted_argmax(
            probs,
            frequency_to_cents(jnp.float32(self.fmin)),
            frequency_to_cents(jnp.float32(self.fmax)),
        )
        return (
            np.asarray(f0, dtype=np.float64).reshape(B, T),
            np.asarray(periodicity, dtype=np.float64).reshape(B, T),
        )


def _frame_audio(waveform: np.ndarray, hop: int) -> np.ndarray:
    """Centered 1024-sample frames every ``hop`` samples (zero padded)."""
    pad = CREPE_WINDOW // 2
    padded = np.pad(waveform, (pad, pad + CREPE_WINDOW))
    n_frames = 1 + len(waveform) // hop
    out = np.empty((n_frames, CREPE_WINDOW), dtype=np.float32)
    for i in range(n_frames):
        start = i * hop
        out[i] = padded[start : start + CREPE_WINDOW]
    return out


def load_crepe_weights(path: str, capacity: int):
    """Load flax variables for ``CrepeModel`` from an npz file.

    The npz keys follow the layout emitted by tools/convert_crepe_weights.py:
    ``conv{i}.kernel`` (W, 1 or C_in, C_out), ``conv{i}.bias``,
    ``bn{i}.scale/bias/mean/var``, ``classifier.kernel/bias``.
    """
    data = np.load(path)
    params = {}
    batch_stats = {}
    for i in range(1, 7):
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(data[f"conv{i}.kernel"]),
            "bias": jnp.asarray(data[f"conv{i}.bias"]),
        }
        params[f"bn{i}"] = {
            "scale": jnp.asarray(data[f"bn{i}.scale"]),
            "bias": jnp.asarray(data[f"bn{i}.bias"]),
        }
        batch_stats[f"bn{i}"] = {
            "mean": jnp.asarray(data[f"bn{i}.mean"]),
            "var": jnp.asarray(data[f"bn{i}.var"]),
        }
    params["classifier"] = {
        "kernel": jnp.asarray(data["classifier.kernel"]),
        "bias": jnp.asarray(data["classifier.bias"]),
    }
    return {"params": params, "batch_stats": batch_stats}


def save_crepe_weights(path: str, variables) -> None:
    """Inverse of ``load_crepe_weights`` (used by the self-training tool)."""
    arrays = {}
    params = variables["params"]
    stats = variables["batch_stats"]
    for i in range(1, 7):
        arrays[f"conv{i}.kernel"] = np.asarray(params[f"conv{i}"]["kernel"])
        arrays[f"conv{i}.bias"] = np.asarray(params[f"conv{i}"]["bias"])
        arrays[f"bn{i}.scale"] = np.asarray(params[f"bn{i}"]["scale"])
        arrays[f"bn{i}.bias"] = np.asarray(params[f"bn{i}"]["bias"])
        arrays[f"bn{i}.mean"] = np.asarray(stats[f"bn{i}"]["mean"])
        arrays[f"bn{i}.var"] = np.asarray(stats[f"bn{i}"]["var"])
    arrays["classifier.kernel"] = np.asarray(params["classifier"]["kernel"])
    arrays["classifier.bias"] = np.asarray(params["classifier"]["bias"])
    np.savez(path, **arrays)
