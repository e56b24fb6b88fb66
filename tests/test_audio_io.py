"""Audio I/O tests: WAV codec round-trips, partial reads, metadata.

The reference relies on libsndfile for these behaviours (meldataset.py:285-320);
we verify our in-tree codec provides the same contract.
"""

import numpy as np
import pytest

from pitchextractor_tpu.io import audio_info, read_audio, write_wav
from pitchextractor_tpu.io.audio import AudioDecodeError


def _sine(sr=24000, freq=220.0, seconds=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("subtype,tol", [
    ("PCM_16", 1e-4),
    ("PCM_24", 1e-6),
    ("PCM_32", 1e-7),
    ("FLOAT", 0.0),
    ("DOUBLE", 1e-7),
])
def test_roundtrip(tmp_path, subtype, tol):
    x = _sine()
    path = str(tmp_path / f"tone_{subtype}.wav")
    write_wav(path, x, 24000, subtype=subtype)
    y, sr = read_audio(path)
    assert sr == 24000
    assert y.shape == x.shape
    assert y.dtype == np.float32
    np.testing.assert_allclose(y, x, atol=max(tol, 1e-12))


def test_stereo_shapes(tmp_path):
    x = np.stack([_sine(freq=220.0), _sine(freq=330.0)], axis=1)
    path = str(tmp_path / "stereo.wav")
    write_wav(path, x, 24000, subtype="PCM_16")
    y, sr = read_audio(path)
    assert y.shape == x.shape  # (n, 2) preserved
    info = audio_info(path)
    assert info.channels == 2
    assert info.frames == x.shape[0]
    assert info.samplerate == 24000

    mono, _ = read_audio(str(path))
    assert mono.ndim == 2


def test_partial_read(tmp_path):
    x = _sine(seconds=1.0)
    path = str(tmp_path / "tone.wav")
    write_wav(path, x, 24000, subtype="FLOAT")
    y, _ = read_audio(path, start=1000, frames=2000)
    np.testing.assert_allclose(y, x[1000:3000], atol=0)
    # read past the end clamps
    y2, _ = read_audio(path, start=len(x) - 100, frames=500)
    assert y2.shape[0] == 100
    # start beyond end -> empty
    y3, _ = read_audio(path, start=len(x) + 10, frames=10)
    assert y3.shape[0] == 0


def test_always_2d(tmp_path):
    x = _sine()
    path = str(tmp_path / "mono.wav")
    write_wav(path, x, 24000)
    y, _ = read_audio(path, always_2d=True)
    assert y.shape == (x.shape[0], 1)


def test_info_duration(tmp_path):
    x = _sine(seconds=0.25)
    path = str(tmp_path / "tone.wav")
    write_wav(path, x, 24000)
    info = audio_info(path)
    assert abs(info.duration - 0.25) < 1e-6


def test_bad_file_raises(tmp_path):
    path = tmp_path / "garbage.wav"
    path.write_bytes(b"not a wav file at all")
    with pytest.raises(AudioDecodeError):
        read_audio(str(path))
    with pytest.raises(AudioDecodeError):
        audio_info(str(path))


def test_truncated_data_chunk(tmp_path):
    x = _sine(seconds=0.1)
    path = str(tmp_path / "trunc.wav")
    write_wav(path, x, 24000, subtype="PCM_16")
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[: len(raw) - 100])  # chop off tail samples
    info = audio_info(path)
    assert info.frames == len(x) - 50  # 2 bytes/frame mono PCM16
    y, _ = read_audio(path)
    assert y.shape[0] == info.frames
