"""Real-codec library bindings (io/codecs_native.py).

The reference's codec rows run opus/mp3 through ffmpeg
(Utils/codec_and_bandwidth_torture.ipynb cells 4, 9); this image ships the
same codec *libraries* without the binary, and these tests gate the
in-process bindings: conformant round trips (the encoder and decoder are
the independent reference implementations — LAME vs mpg123), sane SNR,
pitch preservation, bitrate monotonicity, and exact alignment/length.
Everything skips cleanly on hosts without the libraries.
"""

import numpy as np
import pytest

from pitchextractor_tpu.io.codecs_native import (
    available_codecs,
    codec_roundtrip,
)

SR = 24000


def _tone(freq=220.0, seconds=2.0, amp=0.5):
    t = np.arange(int(SR * seconds)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _snr_db(x, y):
    err = x - y
    return 10 * np.log10(np.sum(x**2) / max(np.sum(err**2), 1e-12))


def _domfreq(y):
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return float(np.fft.rfftfreq(len(y), 1 / SR)[int(np.argmax(spec))])


AVAIL = available_codecs()
needs_mp3 = pytest.mark.skipif(not AVAIL.get("libmp3lame"), reason="lame/mpg123 not present")
needs_opus = pytest.mark.skipif(not AVAIL.get("libopus"), reason="libopus not present")


@needs_mp3
def test_mp3_roundtrip_fidelity_and_alignment():
    x = _tone()
    y = codec_roundtrip(x, SR, "libmp3lame", 64)
    assert y is not None and len(y) == len(x)
    # encoder delay must have been aligned away: a sine round trip at
    # 64 kbps should exceed 15 dB SNR *in phase*
    assert _snr_db(x, y) > 15
    assert abs(_domfreq(y) - 220.0) < 2.0


@needs_mp3
def test_mp3_low_bitrate_still_tracks_pitch():
    x = _tone(freq=330.0)
    y = codec_roundtrip(x, SR, "libmp3lame", 32)
    assert y is not None
    assert abs(_domfreq(y) - 330.0) < 2.0


@needs_opus
def test_opus_roundtrip_fidelity_and_bitrate_monotonic():
    x = _tone()
    lo = codec_roundtrip(x, SR, "libopus", 16)
    hi = codec_roundtrip(x, SR, "libopus", 64)
    assert lo is not None and hi is not None
    assert len(lo) == len(x) and len(hi) == len(x)
    assert _snr_db(x, hi) > 15
    assert _snr_db(x, hi) >= _snr_db(x, lo) - 1.0  # more bits, not worse
    assert abs(_domfreq(lo) - 220.0) < 2.0


@needs_opus
def test_opus_is_lossy_not_identity():
    x = _tone()
    y = codec_roundtrip(x, SR, "libopus", 16)
    assert y is not None
    assert not np.allclose(x, y, atol=1e-4)  # a real codec, not a copy


def test_unknown_codec_returns_none():
    assert codec_roundtrip(_tone(seconds=0.2), SR, "not_a_codec", 32) is None
    assert codec_roundtrip(_tone(seconds=0.2), SR, "vorbis", 32) is None


needs_aac = pytest.mark.skipif(not AVAIL.get("aac"), reason="libavcodec shim not present")


@needs_aac
def test_aac_roundtrip_fidelity_and_alignment():
    x = _tone()
    y = codec_roundtrip(x, SR, "aac", 128)
    assert y is not None and len(y) == len(x)
    # high-bitrate AAC on a sine is near-transparent once the encoder
    # delay is aligned away
    assert _snr_db(x, y) > 20
    assert abs(_domfreq(y) - 220.0) < 2.0


@needs_aac
def test_aac_low_bitrate_lossy_but_tracks_pitch():
    x = _tone(freq=330.0)
    y = codec_roundtrip(x, SR, "aac", 32)
    assert y is not None and len(y) == len(x)
    assert not np.allclose(x, y, atol=1e-4)  # a real lossy codec
    assert abs(_domfreq(y) - 330.0) < 2.0


@needs_aac
def test_aac_bitrate_monotonic():
    x = _tone()
    lo = codec_roundtrip(x, SR, "aac", 32)
    hi = codec_roundtrip(x, SR, "aac", 128)
    assert lo is not None and hi is not None
    assert _snr_db(x, hi) >= _snr_db(x, lo) - 1.0


@needs_opus
def test_opus_unsupported_rate_returns_none():
    x = np.zeros(1000, np.float32)
    assert codec_roundtrip(x, 22050, "libopus", 32) is None


needs_mp2 = pytest.mark.skipif(not AVAIL.get("libtwolame"), reason="twolame not present")


@needs_mp2
def test_mp2_roundtrip_fidelity():
    x = _tone()
    y = codec_roundtrip(x, SR, "libtwolame", 64)
    assert y is not None and len(y) == len(x)
    assert _snr_db(x, y) > 15
    assert abs(_domfreq(y) - 220.0) < 2.0
