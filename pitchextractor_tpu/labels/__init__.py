from .base import (
    BackendComputationError,
    BackendResult,
    BackendUnavailableError,
    BaseF0Backend,
)
from .extractor import F0Extractor, build_f0_extractor
from .registry import BACKEND_REGISTRY, register_backend

__all__ = [
    "BackendComputationError",
    "BackendResult",
    "BackendUnavailableError",
    "BaseF0Backend",
    "F0Extractor",
    "build_f0_extractor",
    "BACKEND_REGISTRY",
    "register_backend",
]
