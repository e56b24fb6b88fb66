"""Native C++ decoder tests: parity with the numpy codec across formats and
partial reads (skipped when the library cannot be built)."""

import os

import numpy as np
import pytest

from pitchextractor_tpu.io import read_audio, write_wav
from pitchextractor_tpu.io.native import get_library, native_info, native_read

pytestmark = pytest.mark.skipif(get_library() is None, reason="libpexio.so unavailable")


@pytest.fixture()
def tone(tmp_path):
    sr = 24000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    return tmp_path, x, sr


@pytest.mark.parametrize("subtype,atol", [
    ("PCM_16", 1e-4), ("PCM_24", 1e-6), ("PCM_32", 1e-7), ("FLOAT", 0.0), ("DOUBLE", 1e-7),
])
def test_native_matches_numpy(tone, subtype, atol, monkeypatch):
    tmp_path, x, sr = tone
    p = str(tmp_path / f"{subtype}.wav")
    write_wav(p, x, sr, subtype=subtype)
    native = native_read(p, 0, len(x), 1)
    assert native is not None
    np.testing.assert_allclose(native.reshape(-1), x, atol=max(atol, 1e-12))


def test_native_info(tone):
    tmp_path, x, sr = tone
    p = str(tmp_path / "i.wav")
    write_wav(p, x, sr)
    frames, got_sr, channels, bits = native_info(p)
    assert (frames, got_sr, channels, bits) == (len(x), sr, 1, 16)


def test_native_partial_and_clamped(tone):
    tmp_path, x, sr = tone
    p = str(tmp_path / "p.wav")
    write_wav(p, x, sr, subtype="FLOAT")
    part = native_read(p, 1000, 2000, 1)
    np.testing.assert_allclose(part.reshape(-1), x[1000:3000], atol=0)
    tail = native_read(p, len(x) - 10, 100, 1)
    assert tail.shape[0] == 10


def test_native_stereo(tone):
    tmp_path, x, sr = tone
    stereo = np.stack([x, -x], axis=1)
    p = str(tmp_path / "s.wav")
    write_wav(p, stereo, sr, subtype="PCM_16")
    data = native_read(p, 0, len(x), 2)
    assert data.shape == (len(x), 2)
    np.testing.assert_allclose(data[:, 0], -data[:, 1], atol=1e-4)


def test_native_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.wav")
    open(p, "wb").write(b"not a wav")
    assert native_info(p) is None
    assert native_read(p, 0, 10, 1) is None


def test_read_audio_uses_native_transparently(tone):
    tmp_path, x, sr = tone
    p = str(tmp_path / "t.wav")
    write_wav(p, x, sr)
    y, _ = read_audio(p)
    np.testing.assert_allclose(y, x, atol=1e-4)
