"""Data pipeline tests: caches (format + invalidation), random segments,
bad-file skip, synthetic routing, collation, loader sharding."""

import json
import os

import numpy as np
import pytest

from pitchextractor_tpu.data import Collater, MelDataset, build_dataloader
from pitchextractor_tpu.data.synthetic import HarmonicSynthesizer
from pitchextractor_tpu.dsp.pitch_shift import pitch_shift
from pitchextractor_tpu.io import write_wav

SR = 24000


def _make_wavs(tmp_path, n=3, seconds=1.0, freqs=(220.0, 330.0, 440.0)):
    paths = []
    for i in range(n):
        t = np.arange(int(SR * seconds)) / SR
        x = 0.4 * np.sin(2 * np.pi * freqs[i % len(freqs)] * t)
        p = str(tmp_path / f"utt{i}.wav")
        write_wav(p, x.astype(np.float32), SR)
        paths.append(p)
    return paths


def _lines(paths):
    return [p + "|dummy\n" for p in paths]


@pytest.fixture()
def dataset(tmp_path):
    paths = _make_wavs(tmp_path)
    return MelDataset(_lines(paths), verbose=False), paths


def test_getitem_shapes(dataset):
    ds, _ = dataset
    mel, f0, sil = ds[0]
    assert mel.shape[0] == 80
    assert mel.shape[1] <= 192
    assert f0.shape == sil.shape == (mel.shape[1],)
    assert set(np.unique(sil)).issubset({0.0, 1.0})
    # silence mask is exactly f0 == 0 (meldataset.py:659-666)
    np.testing.assert_array_equal(sil == 1.0, f0 == 0.0)


def test_f0_cache_write_format(tmp_path):
    """Cache files must follow the reference naming + metadata contract."""
    paths = _make_wavs(tmp_path, n=1, seconds=0.3)  # short -> full-file path
    ds = MelDataset(_lines(paths), verbose=False)
    ds[0]
    ident = ds.f0_extractor.cache_identifier
    f0_path = paths[0] + f"_f0{ident}.npy"
    meta_path = paths[0] + f"_f0{ident}.json"
    mel_path = paths[0] + "_mel.npy"
    mel_meta = paths[0] + "_mel_meta.json"
    assert os.path.isfile(f0_path) and os.path.isfile(meta_path)
    assert os.path.isfile(mel_path) and os.path.isfile(mel_meta)

    meta = json.load(open(meta_path))
    assert meta == {
        "backend": "jax_ac",
        "cache_identifier": ident,
        "hop_length": 300,
        "sample_rate": SR,
    }
    contour = np.load(f0_path)
    assert contour.dtype == np.float32 and contour.ndim == 1

    mmeta = json.load(open(mel_meta))
    assert mmeta["dataset_sample_rate"] == SR
    assert mmeta["mel_params"]["n_mels"] == 80
    assert set(mmeta) == {
        "audio_sample_rate",
        "audio_num_samples",
        "audio_num_channels",
        "dataset_sample_rate",
        "mel_params",
    }
    mel = np.load(mel_path)
    assert mel.dtype == np.float32 and mel.shape[0] == 80


def test_f0_cache_hit_is_used_and_sliced(tmp_path):
    paths = _make_wavs(tmp_path, n=1, seconds=2.0)
    ds = MelDataset(_lines(paths), verbose=False)
    # long file -> partial read; write a full-file cache manually
    full_audio = 0.4 * np.sin(2 * np.pi * 220.0 * np.arange(int(SR * 2.0)) / SR)
    contour = ds.f0_extractor.compute(full_audio.astype(np.float32)).f0.astype(np.float32)
    ds._save_f0_cache(paths[0], contour, "jax_ac")
    cached = ds._load_cached_f0(paths[0])
    np.testing.assert_array_equal(cached, contour)
    # sliced load for a segment
    sliced, aligned = ds._load_or_compute_f0(
        paths[0], full_audio[:24000], SR, start_sample=6000, expected_frames=80
    )
    assert aligned is True
    assert sliced.shape[0] <= 84
    np.testing.assert_array_equal(sliced, contour[20 : 20 + sliced.shape[0]])
    # non-hop-multiple start rounds to the NEAREST cache frame (6150/300 ->
    # 20.5 -> 20 or 21; round-half-even gives 20), never floor-by-default
    sliced2, _ = ds._load_or_compute_f0(
        paths[0], full_audio[:24000], SR, start_sample=6200, expected_frames=80
    )
    np.testing.assert_array_equal(sliced2, contour[21 : 21 + sliced2.shape[0]])


def test_partial_read_labels_not_time_warped(tmp_path):
    """Regression: cached-contour slices must be trimmed to the segment's
    frame count, not linearly rescaled.  The reference rescales a slice cut
    with a +4-frame margin (meldataset.py:532-537 + 656), which time-warps
    labels by up to ~6 frames across a training segment; with a linear-ramp
    contour the warp shows up as non-unit steps."""
    paths = _make_wavs(tmp_path, n=1, seconds=3.0)
    ramp = (100.0 + np.arange(1 + int(SR * 3.0) // 300)).astype(np.float32)
    for return_wave in (False, True):
        ds = MelDataset(_lines(paths), verbose=False, return_wave=return_wave, seed=123)
        ds._save_f0_cache(paths[0], ramp, "jax_ac")
        for _ in range(3):
            _, f0, _ = ds[0]
            steps = np.diff(f0[f0 > 0])
            # consecutive cache frames -> exactly unit steps, no warp
            np.testing.assert_allclose(steps, 1.0, atol=1e-4)


def test_stale_cache_metadata_invalidated(tmp_path):
    paths = _make_wavs(tmp_path, n=1, seconds=0.3)
    ds = MelDataset(_lines(paths), verbose=False)
    ds[0]
    meta_path = paths[0] + ds.f0_meta_suffix
    meta = json.load(open(meta_path))
    meta["hop_length"] = 999
    json.dump(meta, open(meta_path, "w"))
    assert ds._load_cached_f0(paths[0]) is None
    assert not os.path.isfile(meta_path)  # stale pair removed


def test_legacy_f0_cache_fallback(tmp_path):
    paths = _make_wavs(tmp_path, n=1, seconds=0.3)
    ds = MelDataset(_lines(paths), verbose=False)
    legacy = np.arange(10, dtype=np.float32)
    np.save(paths[0] + "_f0.npy", legacy)
    np.testing.assert_array_equal(ds._load_cached_f0(paths[0]), legacy)


def test_mel_cache_global_invalidation(tmp_path):
    paths = _make_wavs(tmp_path, n=2, seconds=0.3)
    ds = MelDataset(_lines(paths), verbose=False)
    ds[0]
    ds[1]
    assert os.path.isfile(paths[0] + "_mel.npy")
    # corrupt one metadata file -> one-shot global purge of mel+f0 caches
    with open(paths[0] + "_mel_meta.json", "w") as fh:
        fh.write("{not json")
    ds2 = MelDataset(_lines(paths), verbose=False)
    ds2[0]
    # after invalidation+recompute, the first file's caches are rebuilt
    assert os.path.isfile(paths[0] + "_mel.npy")
    assert ds2._mel_cache_invalidated


def test_bad_file_skipped_round_robin(tmp_path):
    paths = _make_wavs(tmp_path, n=2, seconds=0.3)
    bad = str(tmp_path / "broken.wav")
    with open(bad, "wb") as fh:
        fh.write(b"RIFF????WAVEgarbage")
    ds = MelDataset(_lines([bad] + paths), verbose=False)
    mel, f0, sil = ds[0]  # falls through to the next valid file
    assert mel.shape[0] == 80
    assert bad in ds._invalid_paths


def test_all_bad_raises(tmp_path):
    bad = str(tmp_path / "broken.wav")
    with open(bad, "wb") as fh:
        fh.write(b"junk")
    ds = MelDataset(_lines([bad]), verbose=False)
    with pytest.raises(RuntimeError):
        ds[0]


def test_random_crop_long_file(tmp_path):
    paths = _make_wavs(tmp_path, n=1, seconds=4.0)
    ds = MelDataset(_lines(paths), verbose=False)
    mel, f0, sil = ds[0]
    assert mel.shape[1] == 192  # cropped to max_mel_length


def test_synthetic_routing_and_exact_labels(tmp_path):
    paths = _make_wavs(tmp_path, n=2, seconds=0.5)
    synth_cfg = {
        "enabled": True,
        "ratio": 1.0,
        "pitch_shift": {"enabled": False},
        "world_vocoder": {
            "enabled": True,
            "duration": {"min": 0.4, "max": 0.6},
            "pitch_range": [150.0, 250.0],
            "gain_db_range": [-12.0, -6.0],
            "noise_db": None,
        },
    }
    ds = MelDataset(_lines(paths), verbose=False, synthetic_data=synth_cfg)
    assert len(ds) == 4  # 2 real + ratio 1.0 synthetic
    mel, f0, sil = ds[3]  # synthetic index
    assert mel.shape[0] == 80
    voiced = f0[f0 > 0]
    assert voiced.size > 0
    assert np.all((voiced > 100) & (voiced < 400))


def test_synthetic_disabled_for_validation(tmp_path):
    paths = _make_wavs(tmp_path, n=2, seconds=0.3)
    cfg = {"enabled": True, "ratio": 1.0, "world_vocoder": {"enabled": True}}
    ds = MelDataset(_lines(paths), validation=True, verbose=False, synthetic_data=cfg)
    assert len(ds) == 2


def test_harmonic_synthesizer_exact_f0():
    rng = np.random.default_rng(0)
    synth = HarmonicSynthesizer(SR, 300, 1024, config={"noise_db": None}, rng=rng)
    wave, f0 = synth.generate()
    assert wave.dtype == np.float32 and f0.dtype == np.float32
    assert len(wave) == len(f0) * 300
    # the signal's measured pitch must match the declared contour
    from pitchextractor_tpu.labels.trackers import track_pitch

    est = track_pitch(wave, SR, 300)
    n = min(len(est), len(f0))
    mask = (est[:n] > 0) & (f0[:n] > 0)
    assert mask.mean() > 0.7
    cents = 1200 * np.abs(np.log2(est[:n][mask] / f0[:n][mask]))
    assert np.median(cents) < 30


def test_pure_tone_mode_single_partial():
    """tone_probability=1 with 1 partial yields a pure sine at the exact
    contour — the eval suites' stimulus family (round-2 domain-gap fix)."""
    rng = np.random.default_rng(1)
    synth = HarmonicSynthesizer(
        SR,
        300,
        1024,
        config={
            "noise_db": None,
            "tone_probability": 1.0,
            "tone_partials_max": 1,
            "modulation": {"vibrato_probability": 0.0, "max_segments": 1},
        },
        rng=rng,
    )
    wave, f0 = synth.generate()
    from pitchextractor_tpu.labels.trackers import track_pitch

    est = track_pitch(wave, SR, 300)
    n = min(len(est), len(f0))
    mask = (est[:n] > 0) & (f0[:n] > 0)
    cents = 1200 * np.abs(np.log2(est[:n][mask] / f0[:n][mask]))
    assert np.median(cents) < 30

    # single partial: no energy at the 2nd harmonic
    seg = wave[len(wave) // 4 : len(wave) // 4 + 4096].astype(np.float64)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / SR)
    hz = float(np.median(f0[f0 > 0]))
    band = lambda f: spec[(freqs > f * 0.85) & (freqs < f * 1.15)].max()
    assert band(2 * hz) < 0.05 * band(hz)


def test_tone_mode_partial_sets_rolloff():
    rng = np.random.default_rng(2)
    synth = HarmonicSynthesizer(
        SR, 300, 1024, config={"tone_probability": 1.0, "tone_partials_max": 4}, rng=rng
    )
    sets = [synth._sample_partial_set() for _ in range(50)]
    sizes = {len(s) for s in sets}
    assert sizes == {1, 2, 3, 4}
    for s in sets:
        assert s[0] == 1.0 and np.all(np.diff(s) <= 0)  # monotone rolloff


def test_pitch_shift_moves_pitch():
    t = np.arange(SR) / SR
    x = 0.5 * np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    y = pitch_shift(x, SR, 4.0)
    assert y.shape == x.shape
    from pitchextractor_tpu.labels.trackers import track_pitch

    f0 = track_pitch(y, SR, 300)
    voiced = f0[10:-10][f0[10:-10] > 0]
    target = 220.0 * 2 ** (4 / 12)
    assert abs(np.median(voiced) - target) / target < 0.03


def test_collater_contract():
    mel = np.ones((80, 100), np.float32)
    f0 = np.ones((100,), np.float32)
    sil = np.zeros((100,), np.float32)
    mels, f0s, sils = Collater()([(mel, f0, sil), (mel[:, :50], f0[:50], sil[:50])])
    assert mels.shape == (2, 1, 80, 192)
    assert f0s.shape == sils.shape == (2, 192)
    assert mels[0, 0, 0, 99] == 1.0 and mels[0, 0, 0, 100] == 0.0  # zero pad
    assert mels[1, 0, 0, 49] == 1.0 and mels[1, 0, 0, 50] == 0.0


def test_build_dataloader_iterates(tmp_path):
    paths = _make_wavs(tmp_path, n=4, seconds=0.3)
    loader = build_dataloader(
        _lines(paths),
        batch_size=2,
        num_workers=2,
        dataset_config={"verbose": False},
        shard_index=0,
        shard_count=1,
    )
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    mels, f0s, sils = batches[0]
    assert mels.shape == (2, 1, 80, 192)


def test_loader_sharding_disjoint(tmp_path):
    paths = _make_wavs(tmp_path, n=4, seconds=0.3)
    kwargs = dict(batch_size=1, num_workers=0, dataset_config={"verbose": False})
    l0 = build_dataloader(_lines(paths), validation=True, shard_index=0, shard_count=2, **kwargs)
    l1 = build_dataloader(_lines(paths), validation=True, shard_index=1, shard_count=2, **kwargs)
    assert len(l0) == len(l1) == 2
    b0 = list(l0)
    b1 = list(l1)
    assert len(b0) == len(b1) == 2
