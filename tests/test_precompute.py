"""Bulk label precompute tests: cache writes, bucketing, cache-hit skip."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from pitchextractor_tpu.io import write_wav
from precompute_labels import precompute

SR = 24000


def _corpus(tmp_path, durations=(0.4, 0.7, 1.3)):
    paths = []
    for i, seconds in enumerate(durations):
        t = np.arange(int(SR * seconds)) / SR
        x = 0.4 * np.sin(2 * np.pi * (180 + 60 * i) * t)
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, x.astype(np.float32), SR)
        paths.append(p)
    list_path = str(tmp_path / "list.txt")
    with open(list_path, "w") as fh:
        fh.writelines(p + "|x\n" for p in paths)
    return list_path, paths


def test_precompute_writes_caches(tmp_path):
    list_path, paths = _corpus(tmp_path)
    stats = precompute(list_path, config_path="/nonexistent.yml", batch_size=2, verbose=False)
    assert stats["written"] == 3 and stats["failed"] == 0
    ident = stats["cache_identifier"]
    for i, p in enumerate(paths):
        contour = np.load(p + f"_f0{ident}.npy")
        meta = json.load(open(p + f"_f0{ident}.json"))
        expected_frames = 1 + int(SR * (0.4, 0.7, 1.3)[i]) // 300
        assert contour.shape == (expected_frames,)
        assert meta["sample_rate"] == SR and meta["hop_length"] == 300
        voiced = contour[contour > 0]
        freq = 180 + 60 * i
        assert np.median(np.abs(1200 * np.log2(voiced / freq))) < 30

    # second run: everything cache-hits
    stats2 = precompute(list_path, config_path="/nonexistent.yml", verbose=False)
    assert stats2["written"] == 0 and stats2["cached"] == 3


def test_precompute_caches_match_dataset_loading(tmp_path):
    """Contours written by the bulk tool must be picked up by MelDataset."""
    list_path, paths = _corpus(tmp_path, durations=(0.5,))
    precompute(list_path, config_path="/nonexistent.yml", verbose=False)
    from pitchextractor_tpu.data import MelDataset

    ds = MelDataset([p + "|x\n" for p in paths], verbose=False)
    cached = ds._load_cached_f0(paths[0])
    assert cached is not None
    mel, f0, sil = ds[0]
    assert np.count_nonzero(f0) > 5


def test_precompute_skips_bad_files(tmp_path):
    list_path, paths = _corpus(tmp_path, durations=(0.4,))
    bad = str(tmp_path / "bad.wav")
    open(bad, "wb").write(b"junk")
    with open(list_path, "a") as fh:
        fh.write(bad + "|x\n")
    stats = precompute(list_path, config_path="/nonexistent.yml", verbose=False)
    assert stats["failed"] == 1 and stats["written"] == 1


def test_pipelined_matches_serial_exactly(tmp_path, monkeypatch):
    """The upload/compute/fetch pipeline must write the same caches the
    serial dispatch loop would (regression gate for the overlap machinery;
    5 files at batch_size=2 exercises multi-batch carry + the tail)."""
    durations = (0.4, 0.4, 0.7, 0.7, 1.1)
    list_path, paths = _corpus(tmp_path, durations=durations)

    stats = precompute(
        list_path, config_path="/nonexistent.yml", batch_size=2, verbose=False,
        transfer_dtype="float32",
    )
    assert stats["pipelined"] is True and stats["written"] == len(paths)
    ident = stats["cache_identifier"]
    piped = {p: np.load(p + f"_f0{ident}.npy") for p in paths}

    # serial reference: disable the device path on the facade
    from pitchextractor_tpu.labels.extractor import F0Extractor

    monkeypatch.setattr(
        F0Extractor, "supports_device_batch", property(lambda self: False)
    )
    stats2 = precompute(
        list_path, config_path="/nonexistent.yml", batch_size=2, verbose=False,
        force=True,
    )
    assert stats2["pipelined"] is False and stats2["written"] == len(paths)
    for p in paths:
        serial = np.load(p + f"_f0{ident}.npy")
        np.testing.assert_array_equal(piped[p], serial)


def test_int16_transfer_exact_for_pcm16_sources(tmp_path):
    """PCM16-decoded waves are k/32768 grid values, so the int16 wire dtype
    (the default) quantizes losslessly and caches match float32 transfers."""
    list_path, paths = _corpus(tmp_path, durations=(0.4, 0.9))
    s1 = precompute(
        list_path, config_path="/nonexistent.yml", batch_size=2, verbose=False,
        transfer_dtype="int16",
    )
    assert s1["transfer_dtype"] == "int16"
    ident = s1["cache_identifier"]
    i16 = {p: np.load(p + f"_f0{ident}.npy") for p in paths}
    precompute(
        list_path, config_path="/nonexistent.yml", batch_size=2, verbose=False,
        force=True, transfer_dtype="float32",
    )
    for p in paths:
        np.testing.assert_array_equal(i16[p], np.load(p + f"_f0{ident}.npy"))


def test_quantize_waveform_i16_roundtrip():
    from pitchextractor_tpu.labels.bulk import quantize_waveform_i16

    k = np.arange(-32768, 32768, 7, dtype=np.int64)
    x = (k / 32768.0).astype(np.float32)
    q = quantize_waveform_i16(x)
    np.testing.assert_array_equal(q.astype(np.int64), k)
    # out-of-range input clips instead of wrapping
    assert quantize_waveform_i16(np.array([1.5], np.float32))[0] == 32767
