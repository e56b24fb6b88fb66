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
