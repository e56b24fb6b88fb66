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


# ------------------------------------------------------------ prefetch pool
def test_prefetch_pool_parity_and_errors(tmp_path):
    from pitchextractor_tpu.dsp.resample import resample_np
    from pitchextractor_tpu.io.native import NativePrefetchPool

    rng = np.random.default_rng(3)
    sr_hi, sr_native = 48000, 24000
    stereo = np.clip(0.3 * rng.standard_normal((sr_hi // 2, 2)), -0.9, 0.9).astype(np.float32)
    mono = np.clip(0.3 * rng.standard_normal(sr_native // 2), -0.9, 0.9).astype(np.float32)
    p_hi = str(tmp_path / "hi.wav")
    p_mono = str(tmp_path / "mono.wav")
    write_wav(p_hi, stereo, sr_hi)
    write_wav(p_mono, mono, sr_native)

    with NativePrefetchPool(n_threads=2) as pool:
        jobs = {
            "resampled": pool.submit(p_hi, target_sr=sr_native, orig_sr=sr_hi),
            "plain": pool.submit(p_mono, target_sr=sr_native, orig_sr=sr_native),
            "partial": pool.submit(p_mono, start=100, max_frames=64),
            # no orig_sr: worker lacks the kernel, wait() resamples host-side
            "fallback": pool.submit(p_hi, target_sr=16000),
            "missing": pool.submit(str(tmp_path / "nope.wav")),
        }

        wave, sr = jobs and pool.wait(jobs["resampled"])
        decoded, dsr = read_audio(p_hi)
        host = resample_np(np.mean(np.asarray(decoded, np.float32), axis=-1), dsr, sr_native)
        assert sr == sr_native
        np.testing.assert_allclose(wave, host, atol=1e-6)

        mono_decoded = np.asarray(read_audio(p_mono)[0], np.float32).reshape(-1)
        wave, sr = pool.wait(jobs["plain"])
        assert sr == sr_native
        np.testing.assert_array_equal(wave, mono_decoded)

        wave, sr = pool.wait(jobs["partial"])
        np.testing.assert_array_equal(wave, mono_decoded[100:164])

        wave, sr = pool.wait(jobs["fallback"])
        assert sr == 16000
        np.testing.assert_allclose(
            wave,
            resample_np(np.mean(np.asarray(decoded, np.float32), axis=-1), dsr, 16000),
            atol=1e-6,
        )

        with pytest.raises(OSError):
            pool.wait(jobs["missing"])


def test_bulk_precompute_uses_pool(tmp_path, monkeypatch):
    """bulk.precompute_for_dataset writes identical caches through the pool
    and with the pool disabled (host fallback)."""
    from pitchextractor_tpu.data.dataset import MelDataset

    sr, hop = 24000, 300
    paths = []
    rng = np.random.default_rng(5)
    for i, hz in enumerate((220.0, 330.0)):
        t = np.arange(int(sr * 0.6)) / sr
        x = (0.4 * np.sin(2 * np.pi * hz * t)).astype(np.float32)
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, x, sr)
        paths.append(p)

    from pitchextractor_tpu.labels.bulk import precompute_for_dataset

    def build(subdir):
        os.makedirs(str(tmp_path / subdir))
        local = []
        for p in paths:
            q = str(tmp_path / subdir / os.path.basename(p))
            with open(p, "rb") as src, open(q, "wb") as dst:
                dst.write(src.read())
            local.append(q + "|x")
        return MelDataset(local, validation=True, verbose=False)

    ds_pool = build("with_pool")
    stats_pool = precompute_for_dataset(ds_pool, verbose=False)
    assert stats_pool["written"] == 2 and stats_pool["failed"] == 0

    monkeypatch.setenv("PEX_DISABLE_NATIVE_IO", "1")
    import pitchextractor_tpu.io.native as native_mod

    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_load_attempted", False)
    ds_host = build("host_only")
    stats_host = precompute_for_dataset(ds_host, verbose=False)
    monkeypatch.setattr(native_mod, "_load_attempted", False)
    assert stats_host["written"] == 2

    for p, q in zip(ds_pool.data_list, ds_host.data_list):
        a = np.load(p + ds_pool._f0_cache_paths(p)[0][len(p):])
        b = np.load(q + ds_host._f0_cache_paths(q)[0][len(q):])
        np.testing.assert_allclose(a, b, atol=1e-6)
