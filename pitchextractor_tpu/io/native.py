"""ctypes bindings for the native C++ audio decoder (native/pexio.cpp).

Loads ``native/libpexio.so`` when present (``make -C native``), attempting a
one-shot lazy build when a compiler is available; all callers fall back to
the pure-numpy codec in io/audio.py, so the native path is a transparent
accelerator, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpexio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build() -> bool:
    makefile = os.path.join(_NATIVE_DIR, "Makefile")
    if not os.path.isfile(makefile):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.isfile(_LIB_PATH)
    except (subprocess.SubprocessError, OSError) as exc:
        logger.debug("native pexio build failed: %s", exc)
        return False


def get_library() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    with _lock:
        if _lib is not None or _load_attempted:
            return _lib
        _load_attempted = True
        if os.environ.get("PEX_DISABLE_NATIVE_IO"):
            return None
        if not os.path.isfile(_LIB_PATH):
            if not _try_build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as exc:
            logger.debug("failed to load %s: %s", _LIB_PATH, exc)
            return None
        lib.pexio_info.restype = ctypes.c_int32
        lib.pexio_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pexio_read_f32.restype = ctypes.c_int32
        lib.pexio_read_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        logger.info("native pexio decoder loaded from %s", _LIB_PATH)
        return _lib


def native_info(path: str) -> Optional[Tuple[int, int, int, int]]:
    """-> (frames, sample_rate, channels, bits) or None on any failure."""
    lib = get_library()
    if lib is None:
        return None
    frames = ctypes.c_int64()
    sr = ctypes.c_int32()
    channels = ctypes.c_int32()
    bits = ctypes.c_int32()
    status = lib.pexio_info(path.encode(), ctypes.byref(frames), ctypes.byref(sr),
                            ctypes.byref(channels), ctypes.byref(bits))
    if status != 0:
        return None
    return frames.value, sr.value, channels.value, bits.value


def native_read(path: str, start: int, max_frames: int, channels: int) -> Optional[np.ndarray]:
    """Decode interleaved float32 (frames, channels); None on any failure."""
    lib = get_library()
    if lib is None or max_frames < 0:
        return None
    out = np.empty(max_frames * channels, dtype=np.float32)
    got = ctypes.c_int64()
    status = lib.pexio_read_f32(
        path.encode(),
        ctypes.c_int64(start),
        ctypes.c_int64(max_frames),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(got),
    )
    if status != 0:
        return None
    return out[: got.value * channels].reshape(-1, channels)
