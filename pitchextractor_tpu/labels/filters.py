"""Small host-side filters used by the labeling subsystem."""

from __future__ import annotations

import numpy as np


def median_filter_1d(values: np.ndarray, size: int) -> np.ndarray:
    """Centered 1-D median filter with edge replication.

    Mirrors the role of ``torchcrepe.filter.median`` in the reference CREPE
    backend (f0_backends.py:329-332).
    """
    values = np.asarray(values)
    if size <= 1 or values.size == 0:
        return values
    half = size // 2
    padded = np.pad(values, (half, size - 1 - half), mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(padded, size)
    return np.median(windows, axis=-1).astype(values.dtype)
