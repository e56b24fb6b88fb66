"""FLAC codec tests (io/flac.py + io/audio.py dispatch).

The reference reads FLAC transparently through libsndfile (reference
meldataset.py:285-301); real corpora (VCTK) ship as FLAC.  FLAC is lossless,
so the strongest gate is exact PCM round-trip equality through our own
encoder — plus decoder coverage of every subframe type, stereo
decorrelation mode, partial reads via the seek table, and the MelDataset
end-to-end path on a .flac list."""

import struct

import numpy as np
import pytest

from pitchextractor_tpu.io.audio import AudioDecodeError, audio_info, read_audio
from pitchextractor_tpu.io.flac import (
    FlacError,
    crc8,
    crc16,
    flac_info,
    read_flac,
    write_flac,
)

SR = 24000


def _pcm16(x):
    return np.clip(np.round(np.asarray(x, np.float64) * 32768.0), -32768, 32767)


def _tone(freq=220.0, seconds=1.0, sr=SR, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = 0.4 * np.sin(2 * np.pi * freq * t)
    if noise:
        x = x + noise * rng.standard_normal(len(t))
    return x.astype(np.float32)


def test_crc_vectors():
    # CRC-8 poly 0x07 / CRC-16 poly 0x8005, init 0 (RFC 9639 §9.1)
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_mono_lossless_roundtrip(tmp_path):
    x = _tone(noise=0.02)
    p = str(tmp_path / "m.flac")
    write_flac(p, x, SR)
    y, rate = read_flac(p)
    assert rate == SR and y.shape == (len(x), 1)
    np.testing.assert_array_equal(_pcm16(y[:, 0]), _pcm16(x))


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_modes(tmp_path, mode):
    t = np.arange(int(SR * 0.6)) / SR
    rng = np.random.default_rng(1)
    x = np.stack(
        [
            0.4 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.standard_normal(len(t)),
            0.4 * np.sin(2 * np.pi * 220 * t + 0.4) + 0.01 * rng.standard_normal(len(t)),
        ],
        axis=1,
    ).astype(np.float32)
    p = str(tmp_path / f"{mode}.flac")
    write_flac(p, x, SR, stereo_mode=mode)
    y, _ = read_flac(p)
    np.testing.assert_array_equal(_pcm16(y), _pcm16(x))


@pytest.mark.parametrize("n", [1, 37, 4095, 4096, 4097, 9001])
def test_odd_lengths(tmp_path, n):
    rng = np.random.default_rng(n)
    x = (0.8 * rng.standard_normal(n)).astype(np.float32)
    p = str(tmp_path / "o.flac")
    write_flac(p, x, SR)
    y, _ = read_flac(p)
    np.testing.assert_array_equal(_pcm16(y[:, 0]), _pcm16(x))


def test_constant_subframe(tmp_path):
    x = np.full(6000, 0.25, np.float32)
    p = str(tmp_path / "c.flac")
    write_flac(p, x, SR)
    y, _ = read_flac(p)
    np.testing.assert_array_equal(_pcm16(y[:, 0]), _pcm16(x))


def test_partial_reads_via_seektable(tmp_path):
    x = _tone(seconds=2.0, noise=0.05)
    p = str(tmp_path / "p.flac")
    write_flac(p, x, SR)
    info = flac_info(p)
    assert info.seek_points, "encoder must write a seek table"
    full = _pcm16(x)
    for start, count in [(0, 100), (5000, 4096), (40000, 7000), (47990, 100)]:
        y, _ = read_flac(p, start=start, frames=count)
        expect = full[start : start + count]
        np.testing.assert_array_equal(_pcm16(y[:, 0]), expect)
    # past-the-end and tail reads
    y, _ = read_flac(p, start=len(x) + 10)
    assert y.shape[0] == 0
    y, _ = read_flac(p, start=len(x) - 13)
    assert y.shape[0] == 13


def test_audio_io_dispatch(tmp_path):
    """audio_info / read_audio route FLAC by magic with the WAV contract."""
    x = _tone(seconds=0.5)
    p = str(tmp_path / "d.flac")
    write_flac(p, x, SR)
    info = audio_info(p)
    assert info.samplerate == SR and info.channels == 1 and info.frames == len(x)
    wave, rate = read_audio(p)
    assert rate == SR and wave.ndim == 1 and len(wave) == len(x)
    np.testing.assert_array_equal(_pcm16(wave), _pcm16(x))
    wave2, _ = read_audio(p, start=1000, frames=200)
    np.testing.assert_array_equal(_pcm16(wave2), _pcm16(x)[1000:1200])


def test_corrupt_flac_raises(tmp_path):
    p = str(tmp_path / "bad.flac")
    x = _tone(seconds=0.3)
    write_flac(p, x, SR)
    raw = bytearray(open(p, "rb").read())
    # flip a bit in the middle of the first frame payload
    info = flac_info(p)
    raw[info.first_frame_offset + 30] ^= 0x40
    open(p, "wb").write(bytes(raw))
    with pytest.raises((FlacError, AudioDecodeError)):
        read_flac(p)
    # truncated metadata
    open(p, "wb").write(b"fLaC\x00\x00")
    with pytest.raises((FlacError, AudioDecodeError)):
        audio_info(p)


def test_md5_matches_spec_layout(tmp_path):
    """STREAMINFO MD5 is over the little-endian interleaved PCM bytes."""
    import hashlib

    x = _tone(seconds=0.3, noise=0.03)
    p = str(tmp_path / "h.flac")
    write_flac(p, x, SR)
    info = flac_info(p)
    pcm = _pcm16(x).astype("<i2")
    assert info.md5 == hashlib.md5(pcm.tobytes()).digest()


def test_lpc_subframe_decode(tmp_path):
    """Hand-assemble a frame with an LPC subframe (our encoder only emits
    FIXED/CONSTANT/VERBATIM) so the decoder's LPC path is exercised."""
    from pitchextractor_tpu.io.flac import _BitWriter, _utf8_number_bytes

    sr, bps, n = 8000, 16, 64
    rng = np.random.default_rng(5)
    warm = rng.integers(-1000, 1000, size=2)
    res = rng.integers(-40, 40, size=n - 2)
    # x[i] = res[i-2] + (c0*x[i-1] + c1*x[i-2]) >> shift
    coefs, shift, precision = [3, -2], 1, 4
    x = np.zeros(n, dtype=np.int64)
    x[:2] = warm
    for i in range(2, n):
        acc = coefs[0] * x[i - 1] + coefs[1] * x[i - 2]
        x[i] = res[i - 2] + (acc >> shift)
    assert np.all(np.abs(x) < 32768)

    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(6, 4)  # 8-bit blocksize-1 at end of header
    bw.write(0, 4)  # rate from STREAMINFO
    bw.write(0, 4)  # 1 channel
    bw.write(4, 3)  # 16-bit
    bw.write(0, 1)
    for byte in _utf8_number_bytes(0):
        bw.write(byte, 8)
    bw.write(n - 1, 8)
    header = bw.getvalue()

    body = _BitWriter()
    body.write(0, 1)
    body.write(32 + 1, 6)  # LPC order 2 (code 1xxxxx with xxxxx = order-1)
    body.write(0, 1)  # no wasted bits
    for v in warm:
        body.write_signed(int(v), bps)
    body.write(precision - 1, 4)
    body.write_signed(shift, 5)
    for cf in coefs:
        body.write_signed(cf, precision)
    # residual: rice method 0, partition order 0, parameter k
    k = 6
    body.write(0, 2)
    body.write(0, 4)
    body.write(k, 4)
    for v in res:
        u = (int(v) << 1) ^ (int(v) >> 63)
        body.write_unary(u >> k)
        body.write(u & ((1 << k) - 1), k)

    frame = header + bytes([crc8(header)]) + body.getvalue()
    frame += struct.pack(">H", crc16(frame))

    si = _BitWriter()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(0, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + b"\x00" * 16

    p = str(tmp_path / "lpc.flac")
    with open(p, "wb") as fh:
        fh.write(b"fLaC")
        fh.write(bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo)
        fh.write(frame)

    y, rate = read_flac(p)
    assert rate == sr
    np.testing.assert_array_equal(np.round(y[:, 0] * 32768.0).astype(np.int64), x)


def test_dataset_e2e_on_flac_list(tmp_path):
    """MelDataset consumes a .flac list end-to-end: partial reads, F0 cache,
    training example shapes (the reference does this through libsndfile)."""
    from pitchextractor_tpu.data import MelDataset

    paths = []
    for i, seconds in enumerate((2.6, 2.8)):
        x = _tone(freq=180 + 60 * i, seconds=seconds, noise=0.01, seed=i)
        p = str(tmp_path / f"u{i}.flac")
        write_flac(p, x, SR)
        paths.append(p)
    ds = MelDataset([p + "|x\n" for p in paths], verbose=False)
    mel, f0, sil = ds[0]
    assert mel.shape[0] == 80 and mel.shape[1] <= 192
    assert np.count_nonzero(f0) > 5
    mel2, f02, _ = ds[1]
    assert np.count_nonzero(f02) > 5


def test_native_decoder_matches_python(tmp_path):
    """native/pexio.cpp FLAC path must be sample-exact vs io/flac.py on
    every stereo mode and on partial reads (skips if the lib can't build)."""
    from pitchextractor_tpu.io.native import native_read

    rng = np.random.default_rng(9)
    t = np.arange(int(SR * 1.1)) / SR
    st = np.stack(
        [
            0.5 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(len(t)),
            0.5 * np.sin(2 * np.pi * 220 * t + 0.7) + 0.05 * rng.standard_normal(len(t)),
        ],
        axis=1,
    ).astype(np.float32)
    p = str(tmp_path / "nm.flac")
    write_flac(p, st, SR, stereo_mode="mid_side")
    nat = native_read(p, 0, len(st), 2)
    if nat is None:
        pytest.skip("native pexio library unavailable")
    ref, _ = read_flac(p)
    np.testing.assert_array_equal(nat, ref.astype(np.float32))
    nat2 = native_read(p, 4000, 2000, 2)
    ref2, _ = read_flac(p, start=4000, frames=2000)
    np.testing.assert_array_equal(nat2, ref2.astype(np.float32))


def test_native_prefetch_pool_decodes_flac(tmp_path):
    """The decode+resample prefetch pool (bulk labeling's front-end) handles
    FLAC jobs natively now."""
    try:
        from pitchextractor_tpu.io.native import NativePrefetchPool
        pool = NativePrefetchPool(n_threads=1)
    except (RuntimeError, ImportError):
        pytest.skip("native pexio library unavailable")
    x = _tone(seconds=0.6)
    p = str(tmp_path / "pp.flac")
    write_flac(p, x, SR)
    try:
        job = pool.submit(p, target_sr=SR, orig_sr=SR)
        wave, sr = pool.wait(job)
    finally:
        pool.close()
    assert sr == SR
    np.testing.assert_array_equal(_pcm16(wave), _pcm16(x))
