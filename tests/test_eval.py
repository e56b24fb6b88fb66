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


def test_eval_labeler(tmp_path):
    from pitchextractor_tpu.eval.labeling import EvalLabeler

    cfg_path = tmp_path / "c.yml"
    cfg_path.write_text(
        "dataset_params:\n  mel_params:\n    sample_rate: 24000\n"
        "  f0_params:\n    bad_f0_threshold: 5\n"
    )
    labeler = EvalLabeler.from_config(str(cfg_path))
    assert labeler.sample_rate == 24000 and labeler.hop_length == 300
    # missing configs fall back to defaults
    assert EvalLabeler.from_config(str(tmp_path / "missing.yml")).sample_rate == 24000

    # mono downmix + resample happen internally; target_frames alignment
    t48 = np.arange(48000) / 48000
    stereo = np.stack([np.sin(2 * np.pi * 220 * t48)] * 2, axis=1).astype(np.float32)
    f0 = labeler.contour(stereo, sr=48000, target_frames=81)
    assert f0.shape == (81,)
    voiced = f0[f0 > 0]
    assert np.median(np.abs(1200 * np.log2(voiced / 220.0))) < 20


def test_eval_labeler_batch_matches_single():
    from pitchextractor_tpu.eval.labeling import EvalLabeler

    labeler = EvalLabeler(mel_params={"sample_rate": SR, "hop_length": 300})
    t = np.arange(int(SR * 1.2)) / SR
    waves = [
        (0.5 * np.sin(2 * np.pi * f * t[: int(SR * d)])).astype(np.float32)
        for f, d in [(220.0, 1.2), (330.0, 0.9)]
    ]
    batch = labeler.contour_batch(waves)
    assert len(batch) == 2
    for wave, contour in zip(waves, batch):
        single = labeler.contour(wave)
        n = min(len(single), len(contour))
        voiced = (single[:n] > 0) & (contour[:n] > 0)
        cents = np.abs(1200 * np.log2(contour[:n][voiced] / single[:n][voiced]))
        assert np.median(cents) < 10


def test_batch_metrics_match_scalar_loop():
    from pitchextractor_tpu.eval import batch_metrics, compute_metrics

    rng = np.random.default_rng(0)
    ref = np.where(rng.random((5, 40)) < 0.8, rng.uniform(80, 500, (5, 40)), 0.0)
    pred = ref * 2.0 ** (rng.normal(0, 0.2, ref.shape))
    batch = batch_metrics(ref, pred)
    for i in range(ref.shape[0]):
        single = compute_metrics(ref[i], pred[i])
        for key, value in single.items():
            np.testing.assert_allclose(batch[key][i], value, atol=1e-12)


def test_batch_tracking_delay_matches_npcorrelate():
    from pitchextractor_tpu.eval import batch_tracking_delay_ms

    rng = np.random.default_rng(1)
    t = np.arange(200) / 80.0
    ref = np.stack([220 + 20 * np.sin(2 * np.pi * r * t) for r in (0.7, 1.0, 1.4)])
    pred = np.stack([np.roll(row, d) for row, d in zip(ref, (2, 3, 5))])
    lags = batch_tracking_delay_ms(ref, pred, frame_period_ms=12.5)
    for i, row in enumerate(ref):
        rc = row - row.mean()
        pc = pred[i] - pred[i].mean()
        corr = np.correlate(pc, rc, mode="full")
        expected = (np.argmax(corr) - (len(row) - 1)) * 12.5
        np.testing.assert_allclose(lags[i], expected, atol=1e-9)


def test_stimulus_banks_match_scalar_generators():
    from pitchextractor_tpu.eval import glide_bank, tone_bank, vibrato_bank

    bank, tags = vibrato_bank([4.0, 6.0], [60.0], 220.0, 0.5, SR)
    assert len(bank) == 2 and tags[0] == {"rate_hz": 4.0, "depth_cents": 60.0}
    for i in range(2):
        audio, t, f0 = generate_vibrato_waveform(
            tags[i]["rate_hz"], tags[i]["depth_cents"], 220.0, 0.5, SR
        )
        np.testing.assert_allclose(bank.audio[i], audio, atol=1e-5)
        np.testing.assert_allclose(bank.f0[i], f0, rtol=1e-5)

    gbank, gtags = glide_bank([0.3, 0.5], 60.0, 500.0, SR)
    assert gbank.audio.shape[1] == int(0.5 * SR)
    # shorter row is silent past its true length and faded before it
    short = gbank.waveforms()[0]
    assert len(short) == int(0.3 * SR)
    assert np.all(gbank.audio[0, int(0.3 * SR):] == 0.0)
    audio, _, _ = generate_glide_waveform(0.3, 60.0, 500.0, SR)
    np.testing.assert_allclose(short, audio, atol=1e-5)

    tbank = tone_bank([110.0, 220.0], 0.4, SR)
    ref = tbank.frame_reference(33)
    np.testing.assert_allclose(ref[0], 110.0, rtol=1e-5)
    np.testing.assert_allclose(ref[1], 220.0, rtol=1e-5)


def test_frame_reference_hop_exact_timing():
    """With the model hop, frame k of the reference must sample the curve
    at sample k*hop — the notebooks' compressed time base (hop=0) is wrong
    by ~1 frame at the end of a steep short glide (>= 100 cents there)."""
    from pitchextractor_tpu.eval.stimuli import glide_bank

    SR, HOP = 24000, 300
    bank, _ = glide_bank([0.4], 60.0, 500.0, SR)
    L = int(bank.lengths[0])
    num_frames = 1 + L // HOP
    truth = np.linspace(60.0, 500.0, L)[np.minimum(np.arange(num_frames) * HOP, L - 1)]

    exact = bank.frame_reference_row(0, num_frames, HOP)
    np.testing.assert_allclose(exact, truth, rtol=1e-5)

    legacy = bank.frame_reference_row(0, num_frames)
    cents_err = 1200 * np.abs(np.log2(legacy[-1] / truth[-1]))
    assert cents_err > 30, cents_err  # documents the upstream quirk (~1 frame)


def test_compare_dirs_deltas(tmp_path):
    from pitchextractor_tpu.eval.compare import compare_dirs, summarize

    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    a_dir.mkdir(), b_dir.mkdir()
    header = "suite,rate_hz,RPA,RCA,VUV\n"
    # run B covers the same grid in reverse order + one extra row
    (a_dir / "dynamic_pitch_metrics.csv").write_text(
        header + "vibrato,4.0,0.5,0.6,0.9\nvibrato,6.0,0.7,0.8,0.9\n"
    )
    (b_dir / "dynamic_pitch_metrics.csv").write_text(
        header + "vibrato,6.0,0.9,0.9,0.9\nvibrato,4.0,0.9,0.7,0.9\nvibrato,8.0,1.0,1.0,1.0\n"
    )
    # a suite present on only one side is ignored
    (a_dir / "noise_metrics.csv").write_text("suite,snr_db,RPA\nwhite,10.0,0.5\n")

    out_dir = tmp_path / "out"
    results = compare_dirs(str(a_dir), str(b_dir), output_dir=str(out_dir))
    assert set(results) == {"dynamic_pitch"}
    comp = results["dynamic_pitch"]
    assert comp["matched"] == 2 and comp["only_b"] == 1 and comp["only_a"] == 0
    np.testing.assert_allclose(comp["mean_delta"]["RPA"], 0.3, atol=1e-12)
    np.testing.assert_allclose(comp["mean_delta"]["RCA"], 0.1, atol=1e-12)
    np.testing.assert_allclose(comp["mean_delta"]["VUV"], 0.0, atol=1e-12)
    by_rate = {row["rate_hz"]: row for row in comp["rows"]}
    np.testing.assert_allclose(by_rate[4.0]["d_RPA"], 0.4, atol=1e-12)
    np.testing.assert_allclose(by_rate[6.0]["d_RPA"], 0.2, atol=1e-12)
    assert (out_dir / "dynamic_pitch_compare.csv").is_file()

    summary = summarize(results)
    assert summary["dynamic_pitch"]["matched_rows"] == 2
    assert summary["dynamic_pitch"]["unmatched_rows"] == 1


def test_render_bank_phase_exact_mid_clip():
    """Stimulus rendering must match the exact float64 waveform all the way
    through the clip.  The old device-side f32 phase cumsum drifted by whole
    samples mid-clip (phase reaches thousands of radians where the f32 ulp
    quantizes per-sample increments), biasing the rendered instantaneous
    frequency ~10+ cents in a backend-dependent pattern — suite scores moved
    across compiler updates (RESULTS round-4 leg D).  The fixed renderer
    accumulates phase in f64 on the host, wrapped mod 2pi."""
    import numpy as np

    from pitchextractor_tpu.eval.stimuli import render_bank

    sr = 24000
    for hz, dur in ((277.0, 2.0), (196.0, 4.0)):
        n = int(dur * sr)
        curve = np.full(n, hz)
        bank = render_bank(curve, [n], sr)
        t = np.arange(n, dtype=np.float64)
        exact = 0.8 * np.sin(2 * np.pi * hz * (t + 1) / sr)
        # skip the fade-out tail; check the second half of the clip, where
        # the old renderer had already drifted by orders of magnitude more
        err = np.abs(np.asarray(bank.audio[0])[n // 2 : -600] - exact[n // 2 : -600]).max()
        assert err < 1e-5, (hz, dur, err)

    # harmonics ride the same wrapped phase: k * (phase mod 2pi) == k*phase
    # mod 2pi for integer k
    hz, n = 220.0, int(1.0 * 24000)
    curve = np.full(n, hz)
    bank = render_bank(curve, [n], sr, partials=[[(1, 0.6), (3, 0.3)]])
    t = np.arange(n, dtype=np.float64)
    ph = 2 * np.pi * hz * (t + 1) / sr
    exact = 0.6 * np.sin(ph) + 0.3 * np.sin(3 * ph)
    err = np.abs(np.asarray(bank.audio[0])[n // 2 : -600] - exact[n // 2 : -600]).max()
    assert err < 2e-5, err
