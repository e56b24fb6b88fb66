"""Real lossy-codec round trips through in-image codec *libraries*.

The reference's codec torture notebook shells out to an ffmpeg binary for
its opus/mp3/aac rows (/root/reference/Utils/codec_and_bandwidth_torture.ipynb
cells 4, 9 — ``_ffmpeg_encode_decode`` with ``libopus``/``libmp3lame``/
``aac``).  This image has no ffmpeg *binary*, but it does ship the codec
*shared libraries* (``libmp3lame.so.0``, ``libmpg123.so.0``, ``libopus.so.0``
under /usr/lib/x86_64-linux-gnu) — the very same encoders ffmpeg would have
used.  This module binds them with ctypes so the suite's ``codec`` family
rows execute with REAL codecs in-process (VERDICT r3 #6: no more
proxy-only codec coverage):

- ``libmp3lame``: encode with LAME, decode with mpg123 (feed API).
- ``libopus``:    raw Opus packets (self-framed — the degradation under
                  test is the codec, not the Ogg container).
- ``aac``:        libavcodec's native aac encoder/decoder (the codec the
                  reference's ``-c:a aac`` invokes), via the compiled shim
                  ``native/libpexcodec.so`` (native/pexcodec.cpp) — ctypes
                  cannot mirror AVCodecContext struct offsets portably, so
                  the struct-touching code is compiled against the real
                  headers instead.

Codec pipelines are not sample-aligned with their input (LAME encoder
delay + mpg123 gapless handling, Opus lookahead).  Opus is aligned by the
encoder's reported lookahead (``OPUS_GET_LOOKAHEAD``); as a defensive
cross-check both paths are additionally aligned by cross-correlation
against the original — equivalent to the metadata-driven trimming ffmpeg
performs, done measurement-side.

Everything degrades gracefully: a missing library or an unexpected decode
format makes ``codec_roundtrip`` return ``None`` and the suite records a
skipped row with the reason (eval/suites.py), never a fake number.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------- loading


def _load(*names: str):
    for name in names:
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


_LAME = _load("libmp3lame.so.0", "libmp3lame.so")
_MPG123 = _load("libmpg123.so.0", "libmpg123.so")
_OPUS = _load("libopus.so.0", "libopus.so")
_TWOLAME = _load("libtwolame.so.0", "libtwolame.so")

_pexcodec = None
_pexcodec_attempted = False


def _load_pexcodec():
    """Lazy-load (and lazily build) the compiled libavcodec shim."""
    global _pexcodec, _pexcodec_attempted
    if _pexcodec is not None or _pexcodec_attempted:
        return _pexcodec
    _pexcodec_attempted = True
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lib_path = os.path.join(repo, "native", "libpexcodec.so")
    if not os.path.isfile(lib_path):
        try:
            subprocess.run(["make", "-C", os.path.join(repo, "native")],
                           check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, OSError):
            return None
        if not os.path.isfile(lib_path):
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    c = ctypes
    lib.pexcodec_aac_available.restype = c.c_int32
    lib.pexcodec_aac_available.argtypes = []
    lib.pexcodec_aac_roundtrip.restype = c.c_int32
    lib.pexcodec_aac_roundtrip.argtypes = [
        c.POINTER(c.c_float), c.c_int64, c.c_int32, c.c_int32,
        c.POINTER(c.c_float), c.c_int64, c.POINTER(c.c_int64),
        c.POINTER(c.c_int32),
    ]
    if lib.pexcodec_aac_available() != 1:
        return None
    _pexcodec = lib
    return _pexcodec

# mpg123 error enum (mpg123.h, stable public ABI)
_MPG123_OK = 0
_MPG123_NEED_MORE = -10
_MPG123_NEW_FORMAT = -11
_MPG123_DONE = -12
_MPG123_ENC_SIGNED_16 = 0xD0

# opus public ABI constants (opus_defines.h)
_OPUS_APPLICATION_AUDIO = 2049
_OPUS_SET_BITRATE = 4002
_OPUS_GET_LOOKAHEAD = 4027

_prototyped = False


def _prototype() -> None:
    """Declare argtypes/restypes once (all three APIs are opaque-handle,
    function-only interfaces — no struct layouts to mirror)."""
    global _prototyped
    if _prototyped:
        return
    c = ctypes
    if _LAME is not None:
        _LAME.lame_init.restype = c.c_void_p
        for fn in (
            "lame_set_in_samplerate",
            "lame_set_out_samplerate",
            "lame_set_num_channels",
            "lame_set_mode",
            "lame_set_brate",
            "lame_set_quality",
        ):
            getattr(_LAME, fn).argtypes = [c.c_void_p, c.c_int]
            getattr(_LAME, fn).restype = c.c_int
        _LAME.lame_init_params.argtypes = [c.c_void_p]
        _LAME.lame_init_params.restype = c.c_int
        _LAME.lame_encode_buffer.argtypes = [
            c.c_void_p, c.POINTER(c.c_short), c.POINTER(c.c_short),
            c.c_int, c.POINTER(c.c_ubyte), c.c_int,
        ]
        _LAME.lame_encode_buffer.restype = c.c_int
        _LAME.lame_encode_flush.argtypes = [c.c_void_p, c.POINTER(c.c_ubyte), c.c_int]
        _LAME.lame_encode_flush.restype = c.c_int
        _LAME.lame_close.argtypes = [c.c_void_p]
    if _MPG123 is not None:
        _MPG123.mpg123_init.restype = c.c_int
        _MPG123.mpg123_new.argtypes = [c.c_char_p, c.POINTER(c.c_int)]
        _MPG123.mpg123_new.restype = c.c_void_p
        _MPG123.mpg123_open_feed.argtypes = [c.c_void_p]
        _MPG123.mpg123_open_feed.restype = c.c_int
        _MPG123.mpg123_feed.argtypes = [c.c_void_p, c.POINTER(c.c_ubyte), c.c_size_t]
        _MPG123.mpg123_feed.restype = c.c_int
        _MPG123.mpg123_read.argtypes = [
            c.c_void_p, c.POINTER(c.c_ubyte), c.c_size_t, c.POINTER(c.c_size_t)
        ]
        _MPG123.mpg123_read.restype = c.c_int
        _MPG123.mpg123_getformat.argtypes = [
            c.c_void_p, c.POINTER(c.c_long), c.POINTER(c.c_int), c.POINTER(c.c_int)
        ]
        _MPG123.mpg123_getformat.restype = c.c_int
        _MPG123.mpg123_delete.argtypes = [c.c_void_p]
    if _TWOLAME is not None:
        _TWOLAME.twolame_init.restype = c.c_void_p
        for fn in (
            "twolame_set_in_samplerate",
            "twolame_set_out_samplerate",
            "twolame_set_num_channels",
            "twolame_set_mode",
            "twolame_set_bitrate",
        ):
            getattr(_TWOLAME, fn).argtypes = [c.c_void_p, c.c_int]
            getattr(_TWOLAME, fn).restype = c.c_int
        _TWOLAME.twolame_init_params.argtypes = [c.c_void_p]
        _TWOLAME.twolame_init_params.restype = c.c_int
        _TWOLAME.twolame_encode_buffer.argtypes = [
            c.c_void_p, c.POINTER(c.c_short), c.POINTER(c.c_short),
            c.c_int, c.POINTER(c.c_ubyte), c.c_int,
        ]
        _TWOLAME.twolame_encode_buffer.restype = c.c_int
        _TWOLAME.twolame_encode_flush.argtypes = [c.c_void_p, c.POINTER(c.c_ubyte), c.c_int]
        _TWOLAME.twolame_encode_flush.restype = c.c_int
        _TWOLAME.twolame_close.argtypes = [c.POINTER(c.c_void_p)]
    if _OPUS is not None:
        _OPUS.opus_encoder_create.argtypes = [
            c.c_int32, c.c_int, c.c_int, c.POINTER(c.c_int)
        ]
        _OPUS.opus_encoder_create.restype = c.c_void_p
        _OPUS.opus_encode.argtypes = [
            c.c_void_p, c.POINTER(c.c_int16), c.c_int, c.POINTER(c.c_ubyte), c.c_int32
        ]
        _OPUS.opus_encode.restype = c.c_int32
        _OPUS.opus_encoder_destroy.argtypes = [c.c_void_p]
        _OPUS.opus_decoder_create.argtypes = [c.c_int32, c.c_int, c.POINTER(c.c_int)]
        _OPUS.opus_decoder_create.restype = c.c_void_p
        _OPUS.opus_decode.argtypes = [
            c.c_void_p, c.POINTER(c.c_ubyte), c.c_int32,
            c.POINTER(c.c_int16), c.c_int, c.c_int,
        ]
        _OPUS.opus_decode.restype = c.c_int
        _OPUS.opus_decoder_destroy.argtypes = [c.c_void_p]
    _prototyped = True


def available_codecs() -> Dict[str, bool]:
    """Which real-codec paths can run on this host."""
    return {
        "libmp3lame": _LAME is not None and _MPG123 is not None,
        "libopus": _OPUS is not None and _opus_supported_rate(24000),
        "libtwolame": _TWOLAME is not None and _MPG123 is not None,
        "aac": _load_pexcodec() is not None,
    }


# ------------------------------------------------------------------- utils


def _to_i16(audio: np.ndarray) -> np.ndarray:
    x = np.clip(np.asarray(audio, dtype=np.float64), -1.0, 1.0)
    return (x * 32767.0).astype(np.int16)


def _align_by_xcorr(decoded: np.ndarray, original: np.ndarray, max_lag: int = 6000) -> np.ndarray:
    """Shift ``decoded`` so it is sample-aligned with ``original``.

    Codec pipelines introduce a constant leading delay (encoder+decoder
    lookahead); the lag of peak cross-correlation recovers it.  Output has
    ``len(original)`` samples (zero-padded tail)."""
    n = min(len(decoded), len(original))
    if n == 0:
        return np.zeros_like(original)
    a = original[: min(n, 48000)].astype(np.float64)
    b = decoded[: min(len(decoded), len(a) + max_lag)].astype(np.float64)
    # correlate b against a for non-negative lags (decoded is delayed)
    corr = np.correlate(b, a, mode="valid")
    lag = int(np.argmax(corr)) if corr.size else 0
    out = np.zeros(len(original), dtype=np.float32)
    seg = decoded[lag : lag + len(original)]
    out[: len(seg)] = seg
    return out


# --------------------------------------------------------------------- mp3


def _lame_encode(audio_i16: np.ndarray, sr: int, kbps: int) -> Optional[bytes]:
    _prototype()
    c = ctypes
    gfp = _LAME.lame_init()
    if not gfp:
        return None
    try:
        _LAME.lame_set_in_samplerate(gfp, sr)
        _LAME.lame_set_out_samplerate(gfp, sr)
        _LAME.lame_set_num_channels(gfp, 1)
        _LAME.lame_set_mode(gfp, 3)  # MONO
        _LAME.lame_set_brate(gfp, int(kbps))
        _LAME.lame_set_quality(gfp, 2)
        if _LAME.lame_init_params(gfp) < 0:
            return None
        n = len(audio_i16)
        out = (c.c_ubyte * (n + n // 4 + 7200))()
        pcm = audio_i16.ctypes.data_as(c.POINTER(c.c_short))
        produced = _LAME.lame_encode_buffer(gfp, pcm, pcm, n, out, len(out))
        if produced < 0:
            return None
        data = bytes(out[:produced])
        produced = _LAME.lame_encode_flush(gfp, out, len(out))
        if produced < 0:
            return None
        return data + bytes(out[:produced])
    finally:
        _LAME.lame_close(gfp)


def _mpg123_decode(stream: bytes, expect_sr: int) -> Optional[np.ndarray]:
    _prototype()
    c = ctypes
    _MPG123.mpg123_init()
    err = c.c_int(0)
    h = _MPG123.mpg123_new(None, c.byref(err))
    if not h:
        return None
    try:
        if _MPG123.mpg123_open_feed(h) != _MPG123_OK:
            return None
        buf = (c.c_ubyte * len(stream)).from_buffer_copy(stream)
        if _MPG123.mpg123_feed(h, buf, len(stream)) != _MPG123_OK:
            return None
        chunks: List[bytes] = []
        out = (c.c_ubyte * 65536)()
        done = c.c_size_t(0)
        while True:
            rc = _MPG123.mpg123_read(h, out, len(out), c.byref(done))
            if done.value:
                chunks.append(bytes(out[: done.value]))
            if rc == _MPG123_NEW_FORMAT:
                rate = c.c_long(0)
                ch = c.c_int(0)
                enc = c.c_int(0)
                _MPG123.mpg123_getformat(h, c.byref(rate), c.byref(ch), c.byref(enc))
                if rate.value != expect_sr or ch.value != 1 or enc.value != _MPG123_ENC_SIGNED_16:
                    return None  # unexpected output format -> skip, don't guess
            elif rc in (_MPG123_NEED_MORE, _MPG123_DONE):
                # feed mode: NEED_MORE after the whole stream ~ end of data
                break
            elif rc != _MPG123_OK:
                return None
        if not chunks:
            return None
        pcm = np.frombuffer(b"".join(chunks), dtype=np.int16)
        return pcm.astype(np.float32) / 32768.0
    finally:
        _MPG123.mpg123_delete(h)


# --------------------------------------------------------------------- mp2


def _twolame_encode(audio_i16: np.ndarray, sr: int, kbps: int) -> Optional[bytes]:
    """MPEG-1/2 Layer II via libtwolame (an extra real-codec family beyond
    the reference's opus/mp3/aac list; mpg123 decodes Layer II too)."""
    _prototype()
    c = ctypes
    opts = _TWOLAME.twolame_init()
    if not opts:
        return None
    opts_holder = c.c_void_p(opts)
    try:
        _TWOLAME.twolame_set_in_samplerate(opts, sr)
        _TWOLAME.twolame_set_out_samplerate(opts, sr)
        _TWOLAME.twolame_set_num_channels(opts, 1)
        _TWOLAME.twolame_set_mode(opts, 3)  # TWOLAME_MONO
        _TWOLAME.twolame_set_bitrate(opts, int(kbps))
        if _TWOLAME.twolame_init_params(opts) != 0:
            return None
        n = len(audio_i16)
        out = (c.c_ubyte * (n + n // 4 + 16384))()
        pcm = audio_i16.ctypes.data_as(c.POINTER(c.c_short))
        produced = _TWOLAME.twolame_encode_buffer(opts, pcm, pcm, n, out, len(out))
        if produced < 0:
            return None
        data = bytes(out[:produced])
        produced = _TWOLAME.twolame_encode_flush(opts, out, len(out))
        if produced < 0:
            return None
        return data + bytes(out[:produced])
    finally:
        _TWOLAME.twolame_close(c.byref(opts_holder))


# -------------------------------------------------------------------- opus

_OPUS_RATES = (8000, 12000, 16000, 24000, 48000)


def _opus_supported_rate(sr: int) -> bool:
    return sr in _OPUS_RATES


def _opus_roundtrip(audio_i16: np.ndarray, sr: int, kbps: int) -> Optional[np.ndarray]:
    _prototype()
    c = ctypes
    frame = sr // 50  # 20 ms
    err = c.c_int(0)
    enc = _OPUS.opus_encoder_create(sr, 1, _OPUS_APPLICATION_AUDIO, c.byref(err))
    if not enc or err.value != 0:
        return None
    dec = None
    try:
        # opus_encoder_ctl is variadic: without argtypes ctypes would pass
        # the 64-bit handle as a 32-bit int — wrap every argument explicitly
        _OPUS.opus_encoder_ctl(
            c.c_void_p(enc), c.c_int(_OPUS_SET_BITRATE), c.c_int32(int(kbps) * 1000)
        )
        lookahead = c.c_int32(0)
        _OPUS.opus_encoder_ctl(
            c.c_void_p(enc), c.c_int(_OPUS_GET_LOOKAHEAD), c.byref(lookahead)
        )

        n = len(audio_i16)
        n_pad = (-n) % frame
        pcm = np.concatenate([audio_i16, np.zeros(n_pad, np.int16)])
        packets: List[bytes] = []
        out = (c.c_ubyte * 4000)()  # opus max recommended packet size
        for start in range(0, len(pcm), frame):
            chunk = np.ascontiguousarray(pcm[start : start + frame])
            nb = _OPUS.opus_encode(
                enc, chunk.ctypes.data_as(c.POINTER(c.c_int16)), frame, out, len(out)
            )
            if nb < 0:
                return None
            packets.append(bytes(out[:nb]))

        err2 = c.c_int(0)
        dec = _OPUS.opus_decoder_create(sr, 1, c.byref(err2))
        if not dec or err2.value != 0:
            return None
        decoded = np.zeros(len(pcm) + frame, dtype=np.int16)
        pos = 0
        for pkt in packets:
            pbuf = (c.c_ubyte * len(pkt)).from_buffer_copy(pkt)
            got = _OPUS.opus_decode(
                dec,
                pbuf,
                len(pkt),
                decoded[pos:].ctypes.data_as(c.POINTER(c.c_int16)),
                frame,
                0,
            )
            if got < 0:
                return None
            pos += got
        wave = decoded[:pos].astype(np.float32) / 32768.0
        # drop the encoder lookahead (the stream's constant leading delay)
        return wave[int(lookahead.value) :]
    finally:
        _OPUS.opus_encoder_destroy(enc)
        if dec:
            _OPUS.opus_decoder_destroy(dec)


# --------------------------------------------------------------------- aac


def _aac_roundtrip(audio: np.ndarray, sr: int, kbps: int) -> Optional[np.ndarray]:
    """AAC round trip through the compiled libavcodec shim (float in/out;
    AAC is a float-domain codec so no int16 staging is needed)."""
    lib = _load_pexcodec()
    if lib is None:
        return None
    c = ctypes
    x = np.ascontiguousarray(np.clip(audio, -1.0, 1.0), dtype=np.float32)
    cap = len(x) + (1 << 14)  # generous: n + padding/flush tail
    out = np.empty(cap, dtype=np.float32)
    out_n = c.c_int64(0)
    delay = c.c_int32(0)
    rc = lib.pexcodec_aac_roundtrip(
        x.ctypes.data_as(c.POINTER(c.c_float)), len(x), int(sr), int(kbps),
        out.ctypes.data_as(c.POINTER(c.c_float)), cap, c.byref(out_n),
        c.byref(delay),
    )
    if rc != 0 or out_n.value <= 0:
        return None
    got = min(int(out_n.value), cap)
    # drop the encoder's reported leading delay; the caller's xcorr
    # alignment then only corrects residual sub-frame offsets
    return out[:got][max(int(delay.value), 0):]


# ---------------------------------------------------------------- frontend


def codec_roundtrip(
    audio: np.ndarray, sr: int, codec: str, bitrate_kbps: int
) -> Optional[np.ndarray]:
    """Encode+decode ``audio`` through a real codec library; ``None`` when
    the codec is unavailable on this host.  Output is sample-aligned with
    the input and has the same length."""
    name = str(codec)
    avail = available_codecs()
    decoded: Optional[np.ndarray] = None
    if name in ("libmp3lame", "mp3"):
        if not avail["libmp3lame"]:
            return None
        stream = _lame_encode(_to_i16(audio), sr, bitrate_kbps)
        if stream is None:
            return None
        decoded = _mpg123_decode(stream, sr)
    elif name in ("libtwolame", "mp2"):
        if not avail["libtwolame"]:
            return None
        stream = _twolame_encode(_to_i16(audio), sr, bitrate_kbps)
        if stream is None:
            return None
        decoded = _mpg123_decode(stream, sr)
    elif name in ("libopus", "opus"):
        if not avail["libopus"] or not _opus_supported_rate(sr):
            return None
        decoded = _opus_roundtrip(_to_i16(audio), sr, bitrate_kbps)
    elif name in ("aac", "libaac"):
        if not avail["aac"]:
            return None
        decoded = _aac_roundtrip(np.asarray(audio, dtype=np.float32), sr, bitrate_kbps)
    else:
        return None
    if decoded is None or decoded.size == 0:
        return None
    return _align_by_xcorr(decoded, np.asarray(audio, dtype=np.float32))
