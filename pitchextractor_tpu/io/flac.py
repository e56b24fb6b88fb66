"""In-tree FLAC codec (decoder + fixture encoder).

The reference reads audio through libsndfile, which transparently decodes
FLAC (reference meldataset.py:285-301 does partial reads via
``SoundFile.seek``/``read`` on any libsndfile format); real corpora — VCTK
in particular — ship as FLAC.  This image has no libsndfile/ffmpeg/flac, so
this module implements the format from the spec (RFC 9639):

Decoder (``read_flac`` / ``flac_info``):
- STREAMINFO + SEEKTABLE metadata, all other blocks skipped
- frame header parsing (both blocking strategies, UTF-8 coded numbers,
  all block-size/sample-rate/sample-size codes, CRC-8 verified)
- subframes: CONSTANT, VERBATIM, FIXED order 0-4, LPC order 1-32,
  wasted bits
- Rice/Rice2 residual partitions incl. escape codes
- stereo decorrelation: independent, left-side, right-side, mid-side
- frame CRC-16 verified; partial reads start at the nearest seek point
  (or decode-and-skip when no seek table is present)

Encoder (``write_flac``) — correctness-first, used for test fixtures and
corpus interchange: fixed 4096-sample blocks, per-subframe best of
CONSTANT / FIXED orders 0-2 / VERBATIM with single-partition Rice coding,
optional mid/left/right-side stereo modes (decoder coverage), a seek point
per frame, and the spec's MD5 of the decoded stream.  Round-trip
losslessness is test-gated (FLAC is lossless by construction).

The hot decode loop also exists as C++ in native/pexio.cpp (``native_read``
dispatches on container magic); this pure-numpy implementation is the
always-available fallback, same contract as the WAV path (io/audio.py).
"""

from __future__ import annotations

import hashlib
import os
import struct
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


class FlacError(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# CRCs (RFC 9639 §9.1: CRC-8 poly 0x07, CRC-16 poly 0x8005, init 0)
# ---------------------------------------------------------------------------

def _make_crc8_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        table[i] = c
    return table


def _make_crc16_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        table[i] = c
    return table


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over a bytes object with an int accumulator."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos  # next byte to load
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            chunk = self.data[self.pos : self.pos + 8]
            if not chunk:
                raise FlacError("unexpected end of stream")
            self.acc = (self.acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
            self.nbits += 8 * len(chunk)
            self.pos += len(chunk)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nbits -= n
        out = self.acc >> self.nbits
        self.acc &= (1 << self.nbits) - 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count 0 bits until the terminating 1 bit."""
        count = 0
        while True:
            if self.nbits == 0:
                self._fill(1)
            if self.acc == 0:
                count += self.nbits
                self.nbits = 0
                continue
            lead = self.nbits - self.acc.bit_length()
            count += lead
            # consume the leading zeros and the 1 bit
            self.nbits -= lead + 1
            self.acc &= (1 << self.nbits) - 1
            return count

    def align(self) -> None:
        drop = self.nbits % 8
        self.nbits -= drop
        self.acc &= (1 << self.nbits) - 1

    def byte_position(self) -> int:
        return self.pos - self.nbits // 8


class _BitWriter:
    __slots__ = ("chunks", "acc", "nbits")

    def __init__(self):
        self.chunks: List[bytes] = []
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        if self.nbits >= 4096 * 8:
            self._flush_whole_bytes()

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q > 64:
            self.write(0, 64)
            q -= 64
        self.write(1, q + 1)

    def _flush_whole_bytes(self) -> None:
        whole = self.nbits // 8
        if whole:
            rem = self.nbits - whole * 8
            self.chunks.append((self.acc >> rem).to_bytes(whole, "big"))
            self.acc &= (1 << rem) - 1
            self.nbits = rem

    def align(self) -> None:
        pad = (-self.nbits) % 8
        if pad:
            self.write(0, pad)

    def getvalue(self) -> bytes:
        self.align()
        self._flush_whole_bytes()
        return b"".join(self.chunks)


# ---------------------------------------------------------------------------
# Stream metadata
# ---------------------------------------------------------------------------

@dataclass
class FlacStreamInfo:
    sample_rate: int
    channels: int
    bits_per_sample: int
    total_samples: int
    min_blocksize: int
    max_blocksize: int
    md5: bytes
    first_frame_offset: int
    seek_points: List[Tuple[int, int, int]] = field(default_factory=list)
    # seek point: (first_sample, byte_offset_from_first_frame, n_samples)


def _parse_metadata(data: bytes) -> FlacStreamInfo:
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream")
    pos = 4
    info: Optional[FlacStreamInfo] = None
    seek_points: List[Tuple[int, int, int]] = []
    while True:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata")
        header = data[pos]
        last = bool(header & 0x80)
        btype = header & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        payload = data[pos + 4 : pos + 4 + length]
        if len(payload) < length:
            raise FlacError("truncated metadata block")
        if btype == 0:  # STREAMINFO
            if length < 34:
                raise FlacError("short STREAMINFO")
            br = _BitReader(payload)
            min_bs = br.read(16)
            max_bs = br.read(16)
            br.read(24)  # min frame size
            br.read(24)  # max frame size
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5 = payload[18:34]
            info = FlacStreamInfo(rate, channels, bps, total, min_bs, max_bs, md5, 0)
        elif btype == 3:  # SEEKTABLE
            for i in range(length // 18):
                sample, offset, n = struct.unpack_from(">QQH", payload, i * 18)
                if sample != 0xFFFFFFFFFFFFFFFF:  # placeholder
                    seek_points.append((sample, offset, n))
        pos += 4 + length
        if last:
            break
    if info is None:
        raise FlacError("missing STREAMINFO")
    info.first_frame_offset = pos
    info.seek_points = sorted(seek_points)
    return info


def flac_info(path: str) -> FlacStreamInfo:
    with open(path, "rb") as fh:
        head = fh.read(64 * 1024)  # metadata normally fits well within this
        try:
            return _parse_metadata(head)
        except FlacError:
            fh.seek(0)
            return _parse_metadata(fh.read())


# ---------------------------------------------------------------------------
# Frame decoding
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
               7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    n = 0
    probe = first
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0:
        raise FlacError("invalid UTF-8 coded number")
    value = first & (0x3F >> n)
    for _ in range(n):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise FlacError("invalid UTF-8 continuation")
        value = (value << 6) | (cont & 0x3F)
    return value


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise FlacError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise FlacError("partition does not divide block size")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        count = blocksize // nparts - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == escape:
            raw = br.read(5)
            if raw == 0:
                out[idx : idx + count] = 0
            else:
                for i in range(count):
                    out[idx + i] = br.read_signed(raw)
        else:
            for i in range(count):
                q = br.read_unary()
                u = (q << k) | br.read(k)
                out[idx + i] = (u >> 1) ^ -(u & 1)
        idx += count
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise FlacError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted

    if stype == 0:  # CONSTANT
        value = br.read_signed(bps)
        out = np.full(blocksize, value, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(blocksize):
            out[i] = br.read_signed(bps)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(order):
            out[i] = br.read_signed(bps)
        res = _decode_residual(br, blocksize, order)
        coefs = _FIXED_COEFFS[order]
        if order == 0:
            out[:] = res
        else:
            x = out
            for i in range(order, blocksize):
                acc = res[i - order]
                for j, c in enumerate(coefs):
                    acc += c * x[i - 1 - j]
                x[i] = acc
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(order):
            out[i] = br.read_signed(bps)
        precision = br.read(4) + 1
        if precision == 16:
            raise FlacError("invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        x = out
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * x[i - 1 - j]
            x[i] = res[i - order] + (acc >> shift)
    else:
        raise FlacError(f"reserved subframe type {stype}")

    if wasted:
        out <<= wasted
    return out


@dataclass
class _Frame:
    start_sample: int
    blocksize: int
    samples: np.ndarray  # (blocksize, channels) int32
    end_byte: int


def _decode_frame(data: bytes, byte_pos: int, info: FlacStreamInfo) -> _Frame:
    hdr_start = byte_pos
    br = _BitReader(data, byte_pos)
    sync = br.read(14)
    if sync != 0x3FFE:
        raise FlacError(f"bad frame sync at byte {byte_pos}")
    if br.read(1):
        raise FlacError("reserved frame header bit set")
    variable = br.read(1)
    bs_code = br.read(4)
    rate_code = br.read(4)
    chan_code = br.read(4)
    size_code = br.read(3)
    if br.read(1):
        raise FlacError("reserved frame header bit set")
    number = _read_utf8_number(br)

    if bs_code == 0:
        raise FlacError("reserved block size code")
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_CODES[bs_code]

    if rate_code == 0:
        pass  # STREAMINFO rate
    elif rate_code == 12:
        br.read(8)
    elif rate_code in (13, 14):
        br.read(16)
    elif rate_code == 15:
        raise FlacError("invalid sample rate code")

    if size_code == 0:
        bps = info.bits_per_sample
    elif size_code == 3:
        raise FlacError("reserved sample size code")
    else:
        bps = _SIZE_CODES[size_code]

    # CRC-8 covers the header bytes read so far
    hdr_end = br.byte_position()
    if crc8(data[hdr_start:hdr_end]) != br.read(8):
        raise FlacError("frame header CRC-8 mismatch")

    if chan_code < 8:
        channels = chan_code + 1
        subs = [_decode_subframe(br, blocksize, bps) for _ in range(channels)]
        stacked = np.stack(subs, axis=1)
    elif chan_code in (8, 9, 10):
        # side channel carries one extra bit
        if chan_code == 8:  # left-side
            left = _decode_subframe(br, blocksize, bps)
            side = _decode_subframe(br, blocksize, bps + 1)
            stacked = np.stack([left, left - side], axis=1)
        elif chan_code == 9:  # right-side (side first)
            side = _decode_subframe(br, blocksize, bps + 1)
            right = _decode_subframe(br, blocksize, bps)
            stacked = np.stack([side + right, right], axis=1)
        else:  # mid-side
            mid = _decode_subframe(br, blocksize, bps)
            side = _decode_subframe(br, blocksize, bps + 1)
            left = mid * 2 + (side & 1) + side
            stacked = np.stack([left >> 1, (left >> 1) - side], axis=1)
    else:
        raise FlacError(f"reserved channel assignment {chan_code}")

    br.align()
    body_end = br.byte_position()
    footer = int.from_bytes(data[body_end : body_end + 2], "big")
    if len(data) < body_end + 2:
        raise FlacError("truncated frame footer")
    if crc16(data[hdr_start:body_end]) != footer:
        raise FlacError("frame CRC-16 mismatch")

    start = number * (info.max_blocksize if not variable else 1)
    if variable:
        start = number
    return _Frame(start, blocksize, stacked.astype(np.int32), body_end + 2)


def read_flac(
    path: str, start: int = 0, frames: int = -1
) -> Tuple[np.ndarray, int]:
    """Decode (a slice of) a FLAC file to float32 in [-1, 1).

    Same contract as ``io.audio.read_audio``: returns ``(samples, rate)``
    with samples shaped ``(n, channels)``.  Partial reads begin at the
    nearest preceding seek point when a SEEKTABLE exists; otherwise frames
    before ``start`` are decoded and discarded (decode cost, no extra IO
    for the skipped tail).
    """
    with open(path, "rb") as fh:
        data = fh.read()
    info = _parse_metadata(data)
    total = info.total_samples
    start = max(0, int(start))
    if total and start >= total:
        count = 0
    elif frames is None or frames < 0:
        count = (total - start) if total else -1
    else:
        count = min(int(frames), total - start) if total else int(frames)
    if count == 0:
        return np.zeros((0, info.channels), dtype=np.float32), info.sample_rate

    byte_pos = info.first_frame_offset
    sample_pos = 0
    for first_sample, offset, _n in info.seek_points:
        if first_sample <= start:
            byte_pos = info.first_frame_offset + offset
            sample_pos = first_sample
        else:
            break

    chunks: List[np.ndarray] = []
    got = 0
    want = count if count >= 0 else None
    while byte_pos + 2 <= len(data):
        frame = _decode_frame(data, byte_pos, info)
        # trust sequential position; frame.start_sample validates when fixed
        lo = max(start - sample_pos, 0)
        if lo < frame.blocksize:
            take = frame.samples[lo:]
            if want is not None:
                take = take[: want - got]
            if len(take):
                chunks.append(take)
                got += len(take)
        sample_pos += frame.blocksize
        byte_pos = frame.end_byte
        if want is not None and got >= want:
            break
        if total and sample_pos >= total:
            break

    if not chunks:
        out = np.zeros((0, info.channels), dtype=np.int32)
    else:
        out = np.concatenate(chunks, axis=0)
    scale = float(1 << (info.bits_per_sample - 1))
    return (out.astype(np.float32) / scale), info.sample_rate


# ---------------------------------------------------------------------------
# Encoder (fixture-grade, spec-conformant)
# ---------------------------------------------------------------------------

def _rice_parameter(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.mean(np.abs(res.astype(np.float64)))) + 1e-9
    k = int(max(0, np.ceil(np.log2(mean + 1.0))))
    return min(k, 14)


def _rice_cost(res: np.ndarray, k: int) -> int:
    u = (np.abs(res) << 1) - (res < 0)
    return int(np.sum(u >> k)) + len(res) * (k + 1)


def _write_residual(bw: _BitWriter, res: np.ndarray, k: int) -> None:
    bw.write(0, 2)  # rice method, 4-bit params
    bw.write(0, 4)  # partition order 0
    bw.write(k, 4)
    u = ((res << 1) ^ (res >> 63)).astype(np.int64)  # zigzag
    for v in u:
        v = int(v)
        bw.write_unary(v >> k)
        bw.write(v & ((1 << k) - 1), k)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if n and np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write_signed(int(x[0]), bps)
        return

    best = None  # (cost_bits, order, res, k)
    for order in (0, 1, 2):
        if n <= order:
            continue
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        k = _rice_parameter(res)
        if k >= 15 or (len(res) and (int(np.max(np.abs(res))) >> k) > (1 << 20)):
            continue  # rice 4-bit params top out at 14; huge quotients -> verbatim
        cost = order * bps + _rice_cost(res, k)
        if best is None or cost < best[0]:
            best = (cost, order, res, k)

    verbatim_cost = n * bps
    if best is None or best[0] >= verbatim_cost:
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
        return

    _, order, res, k = best
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)
    for i in range(order):
        bw.write_signed(int(x[i]), bps)
    _write_residual(bw, res, k)


def write_flac(
    path: str,
    data: np.ndarray,
    samplerate: int,
    bits_per_sample: int = 16,
    blocksize: int = 4096,
    stereo_mode: str = "independent",
) -> None:
    """Encode float [-1, 1] (or int) samples as a FLAC file.

    ``stereo_mode``: independent | left_side | right_side | mid_side
    (only meaningful for 2-channel input; the non-default modes exist to
    exercise the decoder's decorrelation paths).
    """
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    channels = data.shape[1]
    if np.issubdtype(data.dtype, np.floating):
        scale = float(1 << (bits_per_sample - 1))
        pcm = np.clip(np.round(data * scale), -scale, scale - 1).astype(np.int64)
    else:
        pcm = data.astype(np.int64)
    total = len(pcm)

    md5 = hashlib.md5()
    nbytes = (bits_per_sample + 7) // 8
    inter = pcm.astype("<i8").reshape(-1)
    raw = np.zeros((inter.size, nbytes), dtype=np.uint8)
    for b in range(nbytes):
        raw[:, b] = (inter >> (8 * b)) & 0xFF
    md5.update(raw.tobytes())

    frames_payload: List[bytes] = []
    seek_points: List[Tuple[int, int, int]] = []
    offset = 0
    size_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits_per_sample]
    for fi, lo in enumerate(range(0, max(total, 1), blocksize)):
        block = pcm[lo : lo + blocksize]
        bs = len(block)
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        if bs == blocksize and blocksize in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bw.write(8 + int(np.log2(blocksize // 256)), 4)
            tail_bs = None
        elif bs == blocksize and blocksize == 192:
            bw.write(1, 4)
            tail_bs = None
        else:
            bw.write(7, 4)  # 16-bit blocksize-1 at header end
            tail_bs = bs - 1
        bw.write(0, 4)  # sample rate from STREAMINFO
        mode = stereo_mode if channels == 2 else "independent"
        chan_code = {"independent": channels - 1, "left_side": 8,
                     "right_side": 9, "mid_side": 10}[mode]
        bw.write(chan_code, 4)
        bw.write(size_code, 3)
        bw.write(0, 1)
        # UTF-8 coded frame number
        for byte in _utf8_number_bytes(fi):
            bw.write(byte, 8)
        if tail_bs is not None:
            bw.write(tail_bs, 16)
        header = bw.getvalue()
        body = _BitWriter()
        if mode == "independent":
            for c in range(channels):
                _encode_subframe(body, block[:, c], bits_per_sample)
        else:
            left = block[:, 0]
            right = block[:, 1]
            side = left - right
            if mode == "left_side":
                _encode_subframe(body, left, bits_per_sample)
                _encode_subframe(body, side, bits_per_sample + 1)
            elif mode == "right_side":
                _encode_subframe(body, side, bits_per_sample + 1)
                _encode_subframe(body, right, bits_per_sample)
            else:  # mid_side
                mid = (left + right) >> 1
                _encode_subframe(body, mid, bits_per_sample)
                _encode_subframe(body, side, bits_per_sample + 1)
        frame = header + bytes([crc8(header)]) + body.getvalue()
        frame += struct.pack(">H", crc16(frame))
        seek_points.append((lo, offset, bs))
        offset += len(frame)
        frames_payload.append(frame)

    # STREAMINFO
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(samplerate, 20)
    si.write(channels - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(total, 36)
    streaminfo = si.getvalue() + md5.digest()
    assert len(streaminfo) == 34

    seektable = b"".join(
        struct.pack(">QQH", s, o, n) for s, o, n in seek_points
    )

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(b"fLaC")
        fh.write(bytes([0x00]) + len(streaminfo).to_bytes(3, "big") + streaminfo)
        fh.write(bytes([0x80 | 0x03]) + len(seektable).to_bytes(3, "big") + seektable)
        for frame in frames_payload:
            fh.write(frame)


def _utf8_number_bytes(value: int) -> List[int]:
    if value < 0x80:
        return [value]
    out = []
    # smallest n-byte encoding: payload capacity is (7-n) + 6*(n-1) bits
    nbytes = 2
    while value >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    lead_payload = value >> (6 * (nbytes - 1))
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | lead_payload
    out.append(lead)
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((value >> (6 * i)) & 0x3F))
    return out
