"""Eval subsystem tests: metric definitions (incl. reference formula edge
cases), stimuli generators, degradation filters, and a suite smoke run with a
perfect oracle predictor."""

import numpy as np
import pytest

from pitchextractor_tpu.eval import (
    compute_metrics,
    compute_overshoot_cents,
    estimate_tracking_delay_ms,
    generate_glide_waveform,
    generate_vibrato_waveform,
    hz_to_cents,
    rms_cents_error,
    sample_reference_f0,
    synthesize_from_f0_curve,
)
from pitchextractor_tpu.dsp.filters import (
    add_noise_snr,
    agc_pump,
    apply_rir,
    clip_audio,
    equalizer_biquad,
    synthesize_rir,
)

SR = 24000


def test_hz_to_cents_reference_55():
    np.testing.assert_allclose(hz_to_cents(np.array([55.0])), [0.0], atol=1e-4)
    np.testing.assert_allclose(hz_to_cents(np.array([110.0])), [1200.0], atol=1e-3)
    np.testing.assert_array_equal(hz_to_cents(np.array([0.0])), [0.0])  # unvoiced stays 0


def test_compute_metrics_perfect():
    ref = np.array([220.0, 220.0, 0.0, 440.0])
    m = compute_metrics(ref, ref.copy())
    assert m["RPA"] == 1.0 and m["RCA"] == 1.0 and m["VUV"] == 1.0 and m["OctaveError"] == 0.0


def test_compute_metrics_octave_error():
    ref = np.full(10, 220.0)
    pred = np.full(10, 440.0)  # exactly one octave up
    m = compute_metrics(ref, pred)
    assert m["RPA"] == 0.0
    assert m["RCA"] == 1.0  # chroma identical
    assert m["OctaveError"] == 1.0


def test_compute_metrics_unvoiced_reference():
    m = compute_metrics(np.zeros(5), np.zeros(5))
    assert np.isnan(m["RPA"]) and m["VUV"] == 1.0


def test_compute_metrics_voicing_threshold():
    ref = np.array([0.0, 220.0])
    pred = np.array([9.0, 220.0])  # 9 Hz < 10 Hz threshold => unvoiced
    m = compute_metrics(ref, pred)
    assert m["VUV"] == 1.0


def test_rmse_and_lag_and_overshoot():
    t = np.arange(200) / 80.0
    ref = 220 + 20 * np.sin(2 * np.pi * 1.0 * t)
    pred = np.roll(ref, 3)  # 3-frame delay
    lag = estimate_tracking_delay_ms(ref, pred, frame_period_ms=12.5)
    assert abs(lag - 3 * 12.5) < 13.0
    assert rms_cents_error(ref, ref) == 0.0
    ref2 = np.linspace(100, 200, 50)
    pred2 = ref2.copy()
    pred2[-10:] = 230.0  # overshoot past the 200 Hz target
    assert compute_overshoot_cents(ref2, pred2) > 0


def test_stimuli_generators():
    audio, t, f0 = generate_vibrato_waveform(5.0, 100.0, 220.0, 1.0, SR)
    assert audio.shape == t.shape == f0.shape == (SR,)
    assert np.max(np.abs(audio)) <= 1.0
    audio2, t2, f02 = generate_glide_waveform(0.5, 60.0, 500.0, SR)
    assert f02[0] == 60.0 and abs(f02[-1] - 500.0) < 0.1
    ref = sample_reference_f0(t, f0, 81)
    assert ref.shape == (81,)


def test_degradations_shape_preserving():
    audio = synthesize_from_f0_curve(np.full(SR, 220.0), SR)
    for degraded in (
        clip_audio(audio, 0.05),
        agc_pump(audio, SR, 6.0),
        add_noise_snr(audio, 10.0),
        add_noise_snr(audio, 10.0, color="pink"),
        equalizer_biquad(audio, SR, 1000.0, 6.0),
        apply_rir(audio, synthesize_rir(SR, 0.3)),
    ):
        assert degraded.shape == audio.shape
        assert np.all(np.isfinite(degraded))
    # clipping actually clips
    clipped = clip_audio(audio, 0.10)
    assert np.max(np.abs(clipped)) < np.max(np.abs(audio))


def test_rir_t60_decay():
    rir = synthesize_rir(SR, t60=0.5)
    # energy at t60 should be ~60 dB below the early energy
    early = np.max(np.abs(rir[: SR // 100]))
    late = np.max(np.abs(rir[int(0.5 * SR) :])) if len(rir) > int(0.5 * SR) else 0.0
    assert late < early * 0.01


class _OraclePredictor:
    """Perfect predictor: returns the jax_ac tracker contour — exercises the
    suite plumbing without training a model."""

    sample_rate = SR
    frame_period_ms = 12.5

    def predict_f0(self, audio, sr=None, legacy_concat=False):
        from pitchextractor_tpu.labels.trackers import track_pitch

        return track_pitch(np.asarray(audio, np.float32), SR, 300).astype(np.float32)


@pytest.mark.parametrize("suite", ["dynamic_pitch", "amplitude", "noise"])
def test_suite_smoke_with_oracle(tmp_path, suite):
    from pitchextractor_tpu.eval.suites import SUITES

    cfg = {
        "vibrato": {"rates_hz": [5.0], "depth_cents": [60], "duration_seconds": 1.0},
        "glide": {"durations_seconds": [0.8]},
        "tones_hz": [220.0],
        "clip_fractions": [0.0, 0.05],
        "agc_depths_db": [6.0],
        "duration_seconds": 1.0,
        "snr_db": [20],
        "colors": ["white"],
    }
    rows = SUITES[suite](_OraclePredictor(), cfg)
    assert rows
    rpa_rows = [r for r in rows if isinstance(r.get("RPA"), float) and not np.isnan(r["RPA"])]
    assert rpa_rows
    # the oracle should be highly accurate on clean/mild conditions
    assert max(r["RPA"] for r in rpa_rows) > 0.9


def test_run_all_writes_csvs(tmp_path):
    from pitchextractor_tpu.eval.suites import run_all

    cfg = {
        "dynamic_pitch": {
            "vibrato": {"rates_hz": [5.0], "depth_cents": [60], "duration_seconds": 1.0},
            "glide": {"durations_seconds": [0.8]},
        }
    }
    results = run_all(_OraclePredictor(), str(tmp_path), suites=["dynamic_pitch"], config=cfg)
    assert (tmp_path / "dynamic_pitch_metrics.csv").is_file()
    assert len(results["dynamic_pitch"]) == 2


def test_eval_labeling_helpers(tmp_path):
    from pitchextractor_tpu.eval.labeling import (
        build_eval_f0_extractor,
        compute_f0_for_eval,
        ensure_mono,
        load_training_config,
        resample_audio,
        resolve_dataset_params,
    )

    assert load_training_config(None) == {}
    assert load_training_config(str(tmp_path / "missing.yml")) == {}
    cfg_path = tmp_path / "c.yml"
    cfg_path.write_text("dataset_params:\n  mel_params:\n    sample_rate: 24000\n  f0_params:\n    bad_f0_threshold: 5\n")
    cfg = load_training_config(str(cfg_path))
    mel_params, f0_params = resolve_dataset_params(cfg)
    assert mel_params["sample_rate"] == 24000 and f0_params["bad_f0_threshold"] == 5

    stereo = np.ones((10, 2))
    assert ensure_mono(stereo).shape == (10,)
    x = np.sin(2 * np.pi * 220 * np.arange(48000) / 48000).astype(np.float32)
    assert abs(len(resample_audio(x, 48000, 24000)) - 24000) <= 1

    extractor = build_eval_f0_extractor(mel_params, f0_params, fallback_sr=24000, fallback_hop=300)
    tone = (0.5 * np.sin(2 * np.pi * 220 * np.arange(24000) / 24000)).astype(np.float32)
    result = compute_f0_for_eval(tone, 24000, extractor, target_frames=81)
    assert result.f0.shape == (81,)
    assert result.backend_name == "jax_ac"
    voiced = result.f0[result.f0 > 0]
    assert np.median(np.abs(1200 * np.log2(voiced / 220.0))) < 20
