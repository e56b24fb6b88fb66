"""F0 backend base classes and error taxonomy.

Mirrors the reference's backend contract (f0_backends.py:30-106): an
unavailable backend (missing dependency / missing weights) raises
``BackendUnavailableError`` at construction so the cascade facade can skip it
gracefully; a runtime failure raises ``BackendComputationError`` so the
cascade falls through to the next backend.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, Optional

import numpy as np

LOGGER = logging.getLogger(__name__)


def packaged_weights_path(filename: str) -> Optional[str]:
    """Path to a weight file shipped in the repo-level ``weights/`` directory,
    or None when absent.

    The reference's neural labelers download published weights on demand
    (torchcrepe, swift_f0 ONNX — f0_backends.py:184, 352-434); this framework
    ships converted ``.npz`` weights in-tree so the labelers work out of the
    box with the reference config (which enables only ``swiftf0``,
    Configs/config.yml:124-132).
    """
    here = os.path.dirname(os.path.abspath(__file__))
    candidate = os.path.normpath(os.path.join(here, "..", "..", "weights", filename))
    return candidate if os.path.isfile(candidate) else None


class BackendUnavailableError(RuntimeError):
    """Raised when a backend cannot be constructed due to missing deps
    (reference f0_backends.py:30-31)."""


class BackendComputationError(RuntimeError):
    """Raised when a backend fails to compute an F0 trajectory
    (reference f0_backends.py:34-35)."""


@dataclasses.dataclass
class BackendResult:
    """(f0 contour in Hz, producing backend, details) — f0_backends.py:38-42."""

    f0: np.ndarray
    backend_name: str
    details: Optional[str] = None


class BaseF0Backend:
    """Base class for all F0 backends (reference f0_backends.py:45-106).

    Subclasses implement ``compute(audio, sr) -> np.ndarray`` of Hz values at
    ``frame_period_ms`` spacing, with exact zeros marking unvoiced frames.
    TPU-resident backends additionally implement ``compute_batch`` for dense
    batched labeling (a new capability: the reference processes one utterance
    per CPU worker process; we label whole batches per device dispatch).
    """

    backend_type: str = "base"
    # True when the backend's heavy compute runs on an accelerator.  The
    # reference used ``requires_cuda`` to drive DataLoader spawn-context
    # selection (meldataset.py:852-863); in this framework accelerator-backed
    # labeling runs in the main process, so the flag only feeds introspection.
    requires_accelerator: bool = False

    def __init__(
        self,
        name: str,
        sr: int,
        hop_length: int,
        config: Optional[Dict] = None,
        verbose: bool = False,
    ) -> None:
        self.name = name
        self.sample_rate = int(sr)
        self.hop_length = int(hop_length)
        self.config = config or {}
        self.verbose = verbose
        # Kept for config/API compatibility with the reference (its CUDA
        # worker-process machinery, f0_backends.py:66).  Always False here.
        self.requires_cuda = False

    @property
    def frame_period_ms(self) -> float:
        """Frame period derived from the hop unless overridden
        (reference f0_backends.py:69-79)."""
        value = self.config.get("frame_period_ms")
        if value is None:
            value = self.hop_length * 1000.0 / self.sample_rate
        try:
            return float(value)
        except (TypeError, ValueError) as exc:
            raise ValueError(
                f"Invalid float value for 'frame_period_ms' in backend '{self.name}': {value!r}"
            ) from exc

    @property
    def cache_key(self) -> str:
        """Cache key, optionally suffixed (reference f0_backends.py:81-85)."""
        suffix = self.config.get("cache_key_suffix")
        if suffix:
            return f"{self.name}-{suffix}"
        return self.name

    def log(self, message: str) -> None:
        if self.verbose:
            print(f"[{self.name}] {message}")
        LOGGER.debug("[%s] %s", self.name, message)

    def _coerce_float(self, key: str, default: float) -> float:
        value = self.config.get(key, default)
        if value is None:
            value = default
        try:
            return float(value)
        except (TypeError, ValueError) as exc:
            raise ValueError(
                f"Invalid float value for '{key}' in backend '{self.name}': {value!r}"
            ) from exc

    # ------------------------------------------------------------------
    def compute(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        raise NotImplementedError

    # Device-level batched labeling (new TPU capability; no reference
    # counterpart).  Accepts an already device-placed ``(B, samples)`` array
    # (float32, or int16 at the 1/32768 wave scale for cheap transfers) and
    # returns the *device* contour array ``(B, frames)`` without forcing a
    # host sync — so callers can pipeline upload / compute / download
    # (labels/bulk.py).  ``None`` means the backend has no device path and
    # callers must use ``compute_batch``.
    supports_device_batch: bool = False

    def compute_batch_device(self, audio, sr: Optional[int] = None):
        return None

    def compute_batch(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        """Label a dense batch ``(B, samples)`` -> ``(B, frames)``.

        Default: loop over ``compute``; TPU backends override with one jitted
        batched dispatch.
        """
        audio = np.asarray(audio)
        if audio.ndim == 1:
            audio = audio[None, :]
        results = [self.compute(row, sr) for row in audio]
        max_len = max(r.shape[0] for r in results)
        out = np.zeros((len(results), max_len), dtype=np.float64)
        for i, r in enumerate(results):
            out[i, : r.shape[0]] = r
        return out
