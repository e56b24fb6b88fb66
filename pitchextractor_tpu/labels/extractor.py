"""F0 extraction facade: ordered backend cascade with graceful fallback.

Behavioural contract preserved from the reference ``F0Extractor``
(f0_backends.py:634-814):

- ``backend_order`` + ``backends`` config merge, skipping names absent from an
  explicit backends map (so disabled backends never silently reappear);
- ``cache_identifier`` = ``"-" + "_".join(normalised cache keys)`` so cache
  filenames change whenever the backend chain changes (README.md:47 in the
  reference);
- cascade skips a backend on any exception or when it yields fewer than
  ``bad_f0_threshold`` voiced frames; raises ``BackendComputationError`` when
  every backend fails;
- ``align_length`` linear interpolation that re-imposes exact zeros where the
  nearest source frame was unvoiced.

New TPU-era default: when no backend configuration is supplied at all, the
chain is the always-available on-device ``jax_ac`` tracker instead of the
reference's pyworld harvest→dio (which requires a native dependency).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

from .base import (
    BackendComputationError,
    BackendResult,
    BackendUnavailableError,
    BaseF0Backend,
)
from .registry import (
    BACKEND_REGISTRY,
    coerce_enabled_flag,
    normalise_backend_name,
    resolve_backend_config,
)

LOGGER = logging.getLogger(__name__)


class F0Extractor:
    """Facade for computing F0 with configurable backend fallbacks."""

    DEFAULT_SEQUENCE = [
        {"name": "jax_ac", "type": "jax_ac", "config": {}},
        {"name": "jax_yin", "type": "jax_yin", "config": {}},
    ]

    def __init__(
        self,
        sr: int,
        hop_length: int,
        config: Optional[Dict] = None,
        verbose: bool = False,
    ) -> None:
        self.sample_rate = int(sr)
        self.hop_length = int(hop_length)
        self.verbose = verbose
        config = config or {}
        # accept a dataset_params-shaped dict ({"f0_params": {...}}): callers
        # routinely hold that level, and silently falling back to the default
        # chain when handed one is a foot-gun
        if "f0_params" in config and not (
            config.get("backends") or config.get("backend_order")
        ):
            config = dict(config.get("f0_params") or {})
        self.bad_f0_threshold = int(config.get("bad_f0_threshold", 5))
        zero_fill = config.get("zero_fill_value", 0.0)
        if zero_fill is None:
            zero_fill = 0.0
        try:
            self.zero_fill_value = float(zero_fill)
        except (TypeError, ValueError) as exc:
            raise ValueError(f"Invalid zero_fill_value: {zero_fill!r}") from exc

        backends_config = config.get("backends") or {}
        sequence_config = config.get("backend_order")
        if sequence_config:
            sequence = list(sequence_config)
        elif backends_config:
            sequence = list(backends_config.keys())
        else:
            sequence = [entry["name"] for entry in self.DEFAULT_SEQUENCE]

        defaults: Dict[str, Dict] = {e["name"]: e for e in self.DEFAULT_SEQUENCE}
        merged_sequence: List[Dict] = []
        use_defaults_for_missing = not bool(backends_config)
        self._skipped_backends: List[str] = []

        for raw_name in sequence:
            if isinstance(raw_name, dict):
                entry = dict(raw_name)
                entry["enabled"] = coerce_enabled_flag(entry.get("enabled", True))
                merged_sequence.append(entry)
                continue
            name = str(raw_name)
            backend_name = normalise_backend_name(name)
            backend_cfg, backend_cfg_key = resolve_backend_config(name, backends_config)
            if backend_cfg is None and not use_defaults_for_missing:
                LOGGER.debug("Skipping backend '%s': not defined in config", name)
                self._skipped_backends.append(f"{backend_name} (not configured)")
                continue
            default_entry = defaults.get(
                backend_cfg_key, defaults.get(name, {"name": name, "type": name})
            )
            merged_entry = {**default_entry, **(backend_cfg or {})}
            merged_entry.setdefault("name", backend_cfg_key or name)
            merged_entry.setdefault(
                "type", merged_entry.get("backend", merged_entry.get("type", name))
            )
            merged_entry["enabled"] = coerce_enabled_flag(merged_entry.get("enabled", True))
            merged_sequence.append(merged_entry)

        self.backends: List[BaseF0Backend] = []
        self._backend_chain: List[str] = []
        errors: List[str] = []
        for entry in merged_sequence:
            name = entry.get("name") or entry.get("type") or "backend"
            backend_name = normalise_backend_name(str(name))
            if not entry.get("enabled", True):
                self._skipped_backends.append(f"{backend_name} (disabled)")
                continue
            backend_type = (entry.get("type") or entry.get("backend") or "jax_ac").lower()
            backend_cls = BACKEND_REGISTRY.get(backend_type)
            if backend_cls is None:
                self._skipped_backends.append(
                    f"{backend_name} (unknown backend type '{backend_type}')"
                )
                errors.append(f"Unknown backend type '{backend_type}' (entry: {name})")
                continue
            backend_config = entry.get("config") or {
                k: v
                for k, v in entry.items()
                if k not in {"name", "type", "backend", "enabled"}
            }
            try:
                instance = backend_cls(
                    name=backend_name,
                    sr=self.sample_rate,
                    hop_length=self.hop_length,
                    config=backend_config,
                    verbose=verbose,
                )
            except BackendUnavailableError as exc:
                message = f"Skipping backend '{backend_name}': {exc}"
                errors.append(message)
                LOGGER.warning(message)
                self._skipped_backends.append(f"{backend_name} (unavailable: {exc})")
                continue
            except Exception as exc:  # pragma: no cover - defensive
                errors.append(f"Failed to initialise backend '{backend_name}': {exc}")
                LOGGER.exception("Failed to initialise backend '%s'", backend_name)
                self._skipped_backends.append(
                    f"{backend_name} (initialisation error: {exc})"
                )
                continue
            self.backends.append(instance)
            self._backend_chain.append(instance.name)

        if not self.backends:
            error_message = "No usable F0 backends are configured."
            if errors:
                error_message += " Details: " + "; ".join(errors)
            raise RuntimeError(error_message)

        cache_tag_components = [
            normalise_backend_name(backend.cache_key) for backend in self.backends
        ]
        self.cache_identifier = (
            "-" + "_".join(cache_tag_components) if cache_tag_components else ""
        )
        # Reference compatibility flag: drove DataLoader spawn-context
        # selection (meldataset.py:852-863).  Always False here — accelerator
        # labeling happens in-process via batched dispatch.
        self.requires_cuda = any(
            getattr(backend, "requires_cuda", False) for backend in self.backends
        )

    # ------------------------------------------------------------------
    def compute(self, audio: np.ndarray, sr: Optional[int] = None) -> BackendResult:
        """Try backends in order (reference f0_backends.py:761-785)."""
        sr = int(sr or self.sample_rate)
        for backend in self.backends:
            try:
                f0 = backend.compute(audio, sr)
            except BackendUnavailableError as exc:
                LOGGER.warning("Backend '%s' became unavailable: %s", backend.name, exc)
                continue
            except Exception:  # pragma: no cover - defensive
                LOGGER.exception("Backend '%s' failed with error", backend.name)
                continue
            if f0 is None:
                continue
            f0 = np.asarray(f0, dtype=np.float64)
            if np.count_nonzero(f0) < self.bad_f0_threshold:
                LOGGER.warning(
                    "Backend '%s' returned only %d voiced frames; attempting next backend.",
                    backend.name,
                    int(np.count_nonzero(f0)),
                )
                continue
            return BackendResult(f0=f0, backend_name=backend.name)
        raise BackendComputationError(
            "All configured F0 backends failed to produce a valid contour."
        )

    def compute_batch(self, audio: np.ndarray, sr: Optional[int] = None) -> np.ndarray:
        """Dense batched labeling (B, samples) -> (B, frames).

        New TPU capability: dispatches the whole batch to the first backend
        that supports batched compute; rows that come back with too few
        voiced frames fall through the per-utterance cascade.
        """
        sr = int(sr or self.sample_rate)
        audio = np.asarray(audio)
        if audio.ndim == 1:
            audio = audio[None, :]
        primary = self.backends[0]
        f0 = np.asarray(primary.compute_batch(audio, sr), dtype=np.float64)
        return self.apply_batch_fallback(f0, audio, sr)

    @property
    def supports_device_batch(self) -> bool:
        """True when the primary backend offers the device-in/device-out
        batched path (``compute_batch_device``)."""
        return bool(getattr(self.backends[0], "supports_device_batch", False))

    def compute_batch_device(self, audio, sr: Optional[int] = None):
        """Device-level batched labeling through the primary backend.

        Returns a *device* array (no host sync) so callers can pipeline
        upload/compute/download (labels/bulk.py), or ``None`` when the
        primary backend has no device path.  The bad-row cascade fallback
        needs host values — apply ``apply_batch_fallback`` after fetching.
        """
        sr = int(sr or self.sample_rate)
        return self.backends[0].compute_batch_device(audio, sr)

    def apply_batch_fallback(
        self, f0: np.ndarray, audio: np.ndarray, sr: Optional[int] = None
    ) -> np.ndarray:
        """Re-run rows with fewer than ``bad_f0_threshold`` voiced frames
        through the per-utterance cascade (reference f0_backends.py:776-782
        semantics, applied per batch row)."""
        sr = int(sr or self.sample_rate)
        f0 = np.asarray(f0, dtype=np.float64)
        audio = np.asarray(audio)
        if audio.ndim == 1:
            audio = audio[None, :]
        if len(self.backends) > 1:
            bad_rows = np.count_nonzero(f0, axis=-1) < self.bad_f0_threshold
            for i in np.nonzero(bad_rows)[0]:
                try:
                    result = self.compute(audio[i], sr)
                except BackendComputationError:
                    continue
                row = result.f0
                n = min(row.shape[0], f0.shape[1])
                f0[i, :n] = row[:n]
        return f0

    # ------------------------------------------------------------------
    def align_length(self, values: np.ndarray, target_frames: int) -> np.ndarray:
        """Zero-preserving linear length alignment (f0_backends.py:788-806)."""
        values = np.asarray(values, dtype=np.float64)
        if target_frames <= 0:
            return np.zeros((0,), dtype=np.float32)
        if values.size == target_frames:
            return values.astype(np.float32)
        if values.size == 0:
            return np.zeros((target_frames,), dtype=np.float32)

        original_indices = np.linspace(0.0, values.size - 1, num=values.size)
        target_indices = np.linspace(0.0, values.size - 1, num=target_frames)
        resampled = np.interp(target_indices, original_indices, values)

        zero_mask = values == 0.0
        if np.any(zero_mask):
            nearest_indices = np.clip(
                np.round(target_indices).astype(int), 0, values.size - 1
            )
            resampled[zero_mask[nearest_indices]] = 0.0
        return resampled.astype(np.float32)

    # ------------------------------------------------------------------
    def describe_backends(self) -> List[str]:
        return list(self._backend_chain)

    def describe_skipped_backends(self) -> List[str]:
        return list(self._skipped_backends)


def build_f0_extractor(
    sr: int,
    hop_length: int,
    config: Optional[Dict] = None,
    verbose: bool = False,
) -> F0Extractor:
    """Factory (reference f0_backends.py:817-823)."""
    return F0Extractor(sr=sr, hop_length=hop_length, config=config, verbose=verbose)
