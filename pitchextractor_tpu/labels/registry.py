"""Backend registry and config-resolution helpers.

Semantics match the reference exactly (f0_backends.py:587-631): type-keyed
registry, name normalisation to ``[a-z0-9_]``, case-insensitive config lookup,
and string-truthiness for ``enabled`` flags — so reference YAML configs work
unchanged.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple, Type

from .base import BaseF0Backend
from .backends import (
    CrepeBackend,
    DioStyleBackend,
    HarvestStyleBackend,
    PraatACBackend,
    JaxACBackend,
    JaxYinBackend,
    JDCBackend,
    ParselmouthBackend,
    JaxPyinBackend,
    PraatBackend,
    PyWorldBackend,
    SwiftF0Backend,
)

BACKEND_REGISTRY: Dict[str, Type[BaseF0Backend]] = {
    # TPU-native backends (new in this framework)
    "jax_ac": JaxACBackend,
    "tpu_ac": JaxACBackend,
    "jax_yin": JaxYinBackend,
    "yin": JaxYinBackend,
    "jax_pyin": JaxPyinBackend,
    "pyin": JaxPyinBackend,
    "jdc": JDCBackend,
    # in-tree equivalents of the reference default harvest->dio chain
    # (f0_backends.py:109-148); work without pyworld installed
    "dio": DioStyleBackend,
    "world_dio": DioStyleBackend,
    "harvest": HarvestStyleBackend,
    "world_harvest": HarvestStyleBackend,
    # in-tree equivalent of the reference's Praat to_pitch_ac backend
    # (f0_backends.py:437-578); works without parselmouth installed
    "praat_ac": PraatACBackend,
    "boersma": PraatACBackend,
    # reference-compatible backend types (f0_backends.py:587-593)
    "pyworld": PyWorldBackend,
    "crepe": CrepeBackend,
    "swiftf0": SwiftF0Backend,
    "praat": PraatBackend,
    "parselmouth": ParselmouthBackend,
}


def register_backend(backend_type: str, cls: Type[BaseF0Backend]) -> None:
    BACKEND_REGISTRY[backend_type] = cls


def normalise_backend_name(name: str) -> str:
    """``re.sub(r'[^a-z0-9]+', '_', name.lower()).strip('_')``
    (reference f0_backends.py:596-597)."""
    return re.sub(r"[^a-z0-9]+", "_", name.lower()).strip("_")


def resolve_backend_config(
    name: str, backends_config: Dict[str, Dict]
) -> Tuple[Optional[Dict], str]:
    """Case-insensitive backend config lookup (reference f0_backends.py:600-616)."""
    if not backends_config:
        return None, name
    if name in backends_config:
        return backends_config[name], name
    normalised = normalise_backend_name(name)
    for key, cfg in backends_config.items():
        if normalise_backend_name(key) == normalised:
            return cfg, key
    return None, name


def coerce_enabled_flag(value) -> bool:
    """String-truthiness for enabled flags (reference f0_backends.py:619-631)."""
    if isinstance(value, str):
        normalized = value.strip().lower()
        if not normalized:
            return False
        if normalized in {"0", "false", "no", "off"}:
            return False
        if normalized in {"1", "true", "yes", "on"}:
            return True
    return bool(value)
