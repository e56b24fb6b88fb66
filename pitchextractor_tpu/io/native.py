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


def _register_pool_symbols(lib: ctypes.CDLL) -> None:
    if getattr(lib, "_pex_pool_symbols_ready", False):
        return
    lib.pexio_pool_create.restype = ctypes.c_void_p
    lib.pexio_pool_create.argtypes = [ctypes.c_int32]
    lib.pexio_pool_destroy.restype = None
    lib.pexio_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.pexio_pool_set_kernel.restype = ctypes.c_int32
    lib.pexio_pool_set_kernel.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int32,
    ]
    lib.pexio_pool_submit.restype = ctypes.c_int64
    lib.pexio_pool_submit.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
    ]
    lib.pexio_pool_wait.restype = ctypes.c_int32
    lib.pexio_pool_wait.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.pexio_pool_fetch.restype = ctypes.c_int32
    lib.pexio_pool_fetch.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib._pex_pool_symbols_ready = True


_MISSING_KERNEL = -7


class NativePrefetchPool:
    """Native decode → downmix → resample pipeline (native/pexio.cpp pool).

    Submit WAV segment jobs ahead of need; workers decode and resample on
    C++ threads (the GIL is released around the blocking ``wait``), so host
    Python overlaps feature work with file IO — the pipelining role of the
    reference's DataLoader worker processes (meldataset.py:852-863).

    Resample kernels are registered lazily from ``dsp/resample.py`` so the
    native path is numerically the host resampler.  Use as a context manager
    or call ``close()``.
    """

    def __init__(self, n_threads: int = 4):
        lib = get_library()
        if lib is None:
            raise RuntimeError("native pexio library unavailable")
        _register_pool_symbols(lib)
        self._lib = lib
        self._handle = ctypes.c_void_p(lib.pexio_pool_create(int(n_threads)))
        if not self._handle:
            raise RuntimeError("pexio_pool_create failed")
        self._registered_kernels = set()
        self._job_targets = {}

    def _ensure_kernel(self, orig_sr: int, target_sr: int) -> None:
        import math

        g = math.gcd(int(orig_sr), int(target_sr))
        orig, new = int(orig_sr) // g, int(target_sr) // g
        if orig == new or (orig, new) in self._registered_kernels:
            return
        from ..dsp.resample import _sinc_kernel

        kernel, width = _sinc_kernel(orig, new)
        kernel = np.ascontiguousarray(kernel, dtype=np.float64)
        status = self._lib.pexio_pool_set_kernel(
            self._handle,
            ctypes.c_int32(orig),
            ctypes.c_int32(new),
            ctypes.c_int32(width),
            kernel.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int32(kernel.shape[1]),
        )
        if status != 0:
            raise RuntimeError(f"pexio_pool_set_kernel failed: {status}")
        self._registered_kernels.add((orig, new))

    def submit(
        self,
        path: str,
        start: int = 0,
        max_frames: int = -1,
        target_sr: Optional[int] = None,
        orig_sr: Optional[int] = None,
    ) -> int:
        """Enqueue a decode job; returns a job id for ``wait``.

        When resampling is requested, pass ``orig_sr`` (from ``native_info``
        or dataset metadata) so the polyphase kernel is registered before the
        worker needs it; without it an unseen rate pair degrades to a
        host-side resample after fetch.
        """
        if target_sr and orig_sr and orig_sr != target_sr:
            self._ensure_kernel(orig_sr, target_sr)
        job_id = self._lib.pexio_pool_submit(
            self._handle,
            path.encode(),
            ctypes.c_int64(int(start)),
            ctypes.c_int64(int(max_frames)),
            ctypes.c_int32(int(target_sr or 0)),
        )
        if job_id < 0:
            raise RuntimeError("pexio_pool_submit failed")
        if target_sr:
            self._job_targets[int(job_id)] = int(target_sr)
        return int(job_id)

    def wait(self, job_id: int) -> Tuple[np.ndarray, int]:
        """Block for a job; -> (mono float32 waveform, sample_rate).

        Raises OSError on decode failure.  A missing-kernel result is
        transparently resampled on the host (exact same kernel numerics).
        """
        n = ctypes.c_int64()
        sr = ctypes.c_int32()
        status = self._lib.pexio_pool_wait(self._handle, ctypes.c_int64(job_id),
                                           ctypes.byref(n), ctypes.byref(sr))
        if status != 0 and status != _MISSING_KERNEL:
            self._lib.pexio_pool_fetch(
                self._handle, ctypes.c_int64(job_id),
                ctypes.POINTER(ctypes.c_float)(), ctypes.c_int64(0))
            raise OSError(f"native prefetch decode failed (status {status})")
        out = np.empty(max(n.value, 1), dtype=np.float32)
        fetch_status = self._lib.pexio_pool_fetch(
            self._handle,
            ctypes.c_int64(job_id),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(out.shape[0]),
        )
        if fetch_status != 0 and fetch_status != _MISSING_KERNEL:
            raise OSError(f"native prefetch fetch failed (status {fetch_status})")
        wave = out[: n.value]
        target = self._job_targets.pop(job_id, None)
        if status == _MISSING_KERNEL and target and sr.value != target:
            from ..dsp.resample import resample_np

            wave = resample_np(wave, sr.value, target)
            return wave, target
        return wave, sr.value

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.pexio_pool_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
