"""Host audio I/O.

The reference reads audio with libsndfile via the ``soundfile`` package,
including partial reads through ``SoundFile.seek``/``read`` (reference
meldataset.py:285-301) and header-only metadata via ``sf.info``
(meldataset.py:303-320).  This module provides the same capabilities with an
in-tree RIFF/WAVE codec (numpy fast path, optional C++ accelerated decode via
``pitchextractor_tpu.io.native``) so the framework has no dependency on
libsndfile.  Audio decode stays on the host by design — SURVEY.md §2.12 keeps
decode as host CPU I/O; only dense feature tensors go to the TPU.

Supported encodings: PCM u8 / s16 / s24 / s32, IEEE float32 / float64, and
WAVE_FORMAT_EXTENSIBLE wrappers of those.  Output is float32 in [-1, 1),
matching libsndfile's ``dtype='float32'`` normalisation.
"""

from __future__ import annotations

import dataclasses
import io
import os
import struct
from typing import Optional, Tuple

import numpy as np

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_EXTENSIBLE = 0xFFFE
# sentinel format tag for FLAC containers (not a RIFF fmt tag; io-internal)
FORMAT_FLAC = 0xF1AC


class AudioDecodeError(RuntimeError):
    """Raised when an audio file cannot be parsed.

    Fills the role of ``soundfile.LibsndfileError`` in the reference's
    bad-file skip logic (meldataset.py:267).
    """


@dataclasses.dataclass
class AudioInfo:
    """Header metadata, mirroring the fields the reference pulls from
    ``sf.info`` (meldataset.py:314-318)."""

    frames: int
    samplerate: int
    channels: int
    format_tag: int = WAVE_FORMAT_PCM
    bits_per_sample: int = 16
    data_offset: int = 0  # byte offset of the sample data within the file

    @property
    def sample_rate(self) -> int:
        return self.samplerate

    @property
    def duration(self) -> float:
        return self.frames / float(self.samplerate) if self.samplerate else 0.0


def _parse_fmt_chunk(payload: bytes) -> Tuple[int, int, int, int]:
    if len(payload) < 16:
        raise AudioDecodeError("fmt chunk too short")
    (format_tag, channels, samplerate, _byte_rate, _block_align,
     bits_per_sample) = struct.unpack_from("<HHIIHH", payload, 0)
    if format_tag == WAVE_FORMAT_EXTENSIBLE:
        if len(payload) < 40:
            raise AudioDecodeError("extensible fmt chunk too short")
        # SubFormat GUID: first two bytes carry the real format tag.
        (format_tag,) = struct.unpack_from("<H", payload, 24)
    return format_tag, channels, samplerate, bits_per_sample


def _scan_header(handle) -> AudioInfo:
    header = handle.read(12)
    if len(header) < 12 or header[:4] != b"RIFF" or header[8:12] != b"WAVE":
        raise AudioDecodeError("not a RIFF/WAVE file")

    fmt: Optional[Tuple[int, int, int, int]] = None
    data_offset = None
    data_size = None
    while True:
        chunk_header = handle.read(8)
        if len(chunk_header) < 8:
            break
        chunk_id, chunk_size = struct.unpack("<4sI", chunk_header)
        if chunk_id == b"fmt ":
            fmt = _parse_fmt_chunk(handle.read(chunk_size))
            if chunk_size % 2:
                handle.seek(1, io.SEEK_CUR)
        elif chunk_id == b"data":
            data_offset = handle.tell()
            data_size = chunk_size
            # data may legitimately be followed by more chunks, but we have
            # what we need; stop scanning to keep header reads cheap.
            break
        else:
            handle.seek(chunk_size + (chunk_size % 2), io.SEEK_CUR)

    if fmt is None:
        raise AudioDecodeError("missing fmt chunk")
    if data_offset is None or data_size is None:
        raise AudioDecodeError("missing data chunk")

    format_tag, channels, samplerate, bits = fmt
    if channels <= 0 or samplerate <= 0:
        raise AudioDecodeError("invalid fmt parameters")
    bytes_per_frame = channels * (bits // 8)
    if bytes_per_frame <= 0:
        raise AudioDecodeError(f"unsupported bit depth: {bits}")

    # Tolerate truncated/streaming files where the data header over-reports.
    end = handle.seek(0, io.SEEK_END)
    data_size = min(data_size, max(0, end - data_offset))
    frames = data_size // bytes_per_frame

    return AudioInfo(
        frames=frames,
        samplerate=samplerate,
        channels=channels,
        format_tag=format_tag,
        bits_per_sample=bits,
        data_offset=data_offset,
    )


def _sniff_magic(path: str) -> bytes:
    try:
        with open(path, "rb") as handle:
            return handle.read(4)
    except OSError as exc:
        raise AudioDecodeError(f"failed to open audio file '{path}': {exc}") from exc


def audio_info(path: str) -> AudioInfo:
    """Header-only metadata read (reference meldataset.py:303-320).

    Dispatches on container magic: RIFF/WAVE or FLAC (io/flac.py — the
    format real corpora like VCTK ship in; libsndfile reads it transparently
    in the reference, meldataset.py:285-301)."""
    if _sniff_magic(path) == b"fLaC":
        from .flac import FlacError, flac_info

        try:
            info = flac_info(path)
        except (FlacError, OSError, struct.error) as exc:
            raise AudioDecodeError(f"failed to read FLAC header '{path}': {exc}") from exc
        return AudioInfo(
            frames=info.total_samples,
            samplerate=info.sample_rate,
            channels=info.channels,
            format_tag=FORMAT_FLAC,
            bits_per_sample=info.bits_per_sample,
            data_offset=info.first_frame_offset,
        )
    try:
        with open(path, "rb") as handle:
            return _scan_header(handle)
    except (OSError, struct.error) as exc:
        raise AudioDecodeError(f"failed to read audio header '{path}': {exc}") from exc


def _decode_pcm(raw: bytes, info: AudioInfo) -> np.ndarray:
    bits = info.bits_per_sample
    tag = info.format_tag
    if tag == WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            data = np.frombuffer(raw, dtype="<f4").astype(np.float32)
        elif bits == 64:
            data = np.frombuffer(raw, dtype="<f8").astype(np.float32)
        else:
            raise AudioDecodeError(f"unsupported float bit depth: {bits}")
    elif tag == WAVE_FORMAT_PCM:
        if bits == 8:
            data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            as32 = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            as32 = np.where(as32 & 0x800000, as32 - 0x1000000, as32)
            data = as32.astype(np.float32) / 8388608.0
        elif bits == 32:
            data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise AudioDecodeError(f"unsupported PCM bit depth: {bits}")
    else:
        raise AudioDecodeError(f"unsupported WAVE format tag: 0x{tag:04x}")
    return data


def read_audio(
    path: str,
    start: int = 0,
    frames: int = -1,
    always_2d: bool = False,
) -> Tuple[np.ndarray, int]:
    """Read (a slice of) a WAV file as float32.

    Mirrors the reference's partial-read contract (meldataset.py:285-301):
    seek to ``start`` frames, read ``frames`` frames (-1 = to end), return
    ``(samples, samplerate)`` with samples shaped ``(n,)`` for mono or
    ``(n, channels)`` otherwise (``always_2d`` forces 2-D).
    """
    info = audio_info(path)
    bytes_per_frame = info.channels * (info.bits_per_sample // 8)
    start = max(0, int(start))
    if start >= info.frames:
        count = 0
    elif frames is None or frames < 0:
        count = info.frames - start
    else:
        count = min(int(frames), info.frames - start)

    if count <= 0:
        data = np.zeros((0, info.channels), dtype=np.float32)
    elif info.format_tag == FORMAT_FLAC:
        # native C++ decoder (native/pexio.cpp, ~80x the Python fallback)
        from .native import native_read

        data = native_read(path, start, count, info.channels)
        if data is None:
            from .flac import FlacError, read_flac

            try:
                data, _rate = read_flac(path, start, count)
            except (FlacError, OSError) as exc:
                raise AudioDecodeError(f"failed to decode FLAC '{path}': {exc}") from exc
    else:
        # native C++ fast path (native/pexio.cpp) with transparent fallback
        from .native import native_read

        data = native_read(path, start, count, info.channels)
        if data is None:
            data = _read_numpy(path, info, start, count)

    if not always_2d and info.channels == 1:
        data = data.reshape(-1)
    return data, info.samplerate


def _read_numpy(path: str, info: AudioInfo, start: int, count: int) -> np.ndarray:
    bytes_per_frame = info.channels * (info.bits_per_sample // 8)
    try:
        with open(path, "rb") as handle:
            handle.seek(info.data_offset + start * bytes_per_frame)
            raw = handle.read(count * bytes_per_frame)
    except OSError as exc:
        raise AudioDecodeError(f"failed to read audio data '{path}': {exc}") from exc
    usable = (len(raw) // bytes_per_frame) * bytes_per_frame
    return _decode_pcm(raw[:usable], info).reshape(-1, info.channels)


def write_wav(path: str, data: np.ndarray, samplerate: int, subtype: str = "PCM_16") -> None:
    """Write a WAV file (used by tests/eval fixtures; soundfile-style subtypes)."""
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    channels = data.shape[1]
    frames = data.shape[0]

    if subtype == "PCM_16":
        fmt_tag, bits = WAVE_FORMAT_PCM, 16
        payload = np.clip(np.round(data * 32768.0), -32768, 32767).astype("<i2").tobytes()
    elif subtype == "PCM_24":
        fmt_tag, bits = WAVE_FORMAT_PCM, 24
        as32 = np.clip(np.round(data * 8388608.0), -8388608, 8388607).astype(np.int32)
        flat = as32.reshape(-1)
        b = np.empty((flat.size, 3), dtype=np.uint8)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        payload = b.tobytes()
    elif subtype == "PCM_32":
        fmt_tag, bits = WAVE_FORMAT_PCM, 32
        payload = np.clip(np.round(data * 2147483648.0), -2147483648, 2147483647).astype("<i4").tobytes()
    elif subtype in ("FLOAT", "FLOAT32"):
        fmt_tag, bits = WAVE_FORMAT_IEEE_FLOAT, 32
        payload = data.astype("<f4").tobytes()
    elif subtype in ("DOUBLE", "FLOAT64"):
        fmt_tag, bits = WAVE_FORMAT_IEEE_FLOAT, 64
        payload = data.astype("<f8").tobytes()
    else:
        raise ValueError(f"unsupported subtype: {subtype}")

    byte_rate = samplerate * channels * bits // 8
    block_align = channels * bits // 8
    fmt_chunk = struct.pack(
        "<HHIIHH", fmt_tag, channels, samplerate, byte_rate, block_align, bits
    )
    data_size = len(payload)
    riff_size = 4 + (8 + len(fmt_chunk)) + (8 + data_size)

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as handle:
        handle.write(b"RIFF" + struct.pack("<I", riff_size) + b"WAVE")
        handle.write(b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk)
        handle.write(b"data" + struct.pack("<I", data_size) + payload)
        if data_size % 2:
            handle.write(b"\x00")
    del frames
