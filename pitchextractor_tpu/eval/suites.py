"""Scripted robustness-evaluation suites.

1:1 replacements for the reference's six Jupyter notebooks (SURVEY.md §2.13),
runnable headless as the integration test layer the reference lacks
(SURVEY.md §4).  Every suite takes an ``F0Predictor`` and returns a list of
metric rows (dicts); ``run_all`` writes one CSV per suite under an artifacts
directory, matching the notebooks' CSV outputs.

Suites:
- dynamic_pitch  vibrato sweep (rates × depths) + glide sweep
                 (Utils/dynamic_pitch_behavior.ipynb)
- amplitude      clean tones under sample clipping and AGC pumping sweeps
                 (Utils/amplitude_pathologies.ipynb)
- codec_bandwidth  resample round-trips 8-44.1 kHz; ffmpeg codecs when the
                 binary exists on the host (Utils/codec_and_bandwidth_torture.ipynb)
- room_mic       synthetic-RIR convolution (room categories × T60) and
                 cascaded mic-EQ coloration (Utils/room_and_microphone_stress.ipynb)
- pitch_range_timbre  vocal registers × harmonic timbre profiles
                 (Utils/pitch_range_and_timbre_coverage.ipynb)
- noise          white/pink additive noise SNR sweep
                 (Utils/noise_robustness_evaluation.ipynb — corrupted in the
                 reference snapshot; reconstructed per its visible pattern)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Dict, List, Optional

import numpy as np

from ..dsp.filters import (
    add_noise_snr,
    agc_pump,
    apply_microphone_eq,
    apply_rir,
    clip_audio,
    synthesize_rir,
)
from ..dsp.resample import resample_np
from .metrics import (
    compute_metrics,
    compute_overshoot_cents,
    estimate_tracking_delay_ms,
    rms_cents_error,
)
from .stimuli import (
    generate_glide_waveform,
    generate_vibrato_waveform,
    sample_reference_f0,
    synthesize_from_f0_curve,
)

DEFAULT_VIBRATO = {
    "base_frequency_hz": 220.0,
    "duration_seconds": 3.0,
    "rates_hz": [4.0, 6.0, 8.0],
    "depth_cents": [20, 60, 120, 200],
}
DEFAULT_GLIDE = {
    "start_hz": 60.0,
    "end_hz": 500.0,
    "durations_seconds": [0.4, 0.8, 1.6, 3.2],
}

# pitch-range registers (pitch_range notebook cell 5)
DEFAULT_REGISTERS = [
    {"name": "Bass", "fmin": 70.0, "fmax": 120.0},
    {"name": "Baritone", "fmin": 100.0, "fmax": 180.0},
    {"name": "Tenor/Alto", "fmin": 160.0, "fmax": 350.0},
    {"name": "Child/Falsetto", "fmin": 350.0, "fmax": 1000.0},
]
# harmonic timbre profiles (pitch_range notebook cell 7)
DEFAULT_TIMBRES = [
    {"name": "pure", "partials": [(1, 1.0)], "noise_snr_db": None},
    {"name": "bright", "partials": [(1, 1.0), (2, 0.6), (3, 0.4), (4, 0.25)], "noise_snr_db": None},
    {"name": "dark", "partials": [(1, 1.0), (2, 0.25), (3, 0.08)], "noise_snr_db": None},
    {"name": "breathy", "partials": [(1, 1.0), (2, 0.4)], "noise_snr_db": 15.0},
]


def _metric_row(reference, prediction, frame_period_ms=None, **tags) -> Dict:
    row = dict(tags)
    row.update(compute_metrics(reference, prediction))
    row["RMSE_cents"] = rms_cents_error(reference, prediction)
    if frame_period_ms is not None:
        row["Lag_ms"] = estimate_tracking_delay_ms(reference, prediction, frame_period_ms)
    return row


def dynamic_pitch_suite(predictor, config: Optional[Dict] = None) -> List[Dict]:
    config = config or {}
    sr = predictor.sample_rate
    rows: List[Dict] = []

    vib = {**DEFAULT_VIBRATO, **(config.get("vibrato") or {})}
    for rate in vib["rates_hz"]:
        for depth in vib["depth_cents"]:
            audio, t, f0_curve = generate_vibrato_waveform(
                float(rate), float(depth), float(vib["base_frequency_hz"]),
                float(vib["duration_seconds"]), sr,
            )
            prediction = predictor.predict_f0(audio)
            reference = sample_reference_f0(t, f0_curve, prediction.shape[0])
            rows.append(
                _metric_row(reference, prediction, suite="vibrato", rate_hz=rate, depth_cents=depth)
            )

    glide = {**DEFAULT_GLIDE, **(config.get("glide") or {})}
    for duration in glide["durations_seconds"]:
        audio, t, f0_curve = generate_glide_waveform(
            float(duration), float(glide["start_hz"]), float(glide["end_hz"]), sr
        )
        prediction = predictor.predict_f0(audio)
        reference = sample_reference_f0(t, f0_curve, prediction.shape[0])
        row = _metric_row(
            reference, prediction, frame_period_ms=predictor.frame_period_ms,
            suite="glide", duration_s=duration,
        )
        row["Overshoot_cents"] = compute_overshoot_cents(reference, prediction)
        rows.append(row)
    return rows


def amplitude_suite(predictor, config: Optional[Dict] = None) -> List[Dict]:
    config = config or {}
    sr = predictor.sample_rate
    tones = config.get("tones_hz", [110.0, 220.0, 440.0])
    clip_fractions = config.get("clip_fractions", [0.0, 0.01, 0.03, 0.05, 0.10])
    pump_depths = config.get("agc_depths_db", [0.0, 3.0, 6.0, 10.0])
    duration = float(config.get("duration_seconds", 2.0))
    rows = []
    for tone in tones:
        t = np.arange(int(sr * duration)) / sr
        f0_curve = np.full(len(t), tone)
        audio = synthesize_from_f0_curve(f0_curve, sr)
        for frac in clip_fractions:
            pred = predictor.predict_f0(clip_audio(audio, float(frac)))
            ref = sample_reference_f0(t.astype(np.float32), f0_curve, pred.shape[0])
            rows.append(_metric_row(ref, pred, suite="clipping", tone_hz=tone, clip_fraction=frac))
        for depth in pump_depths:
            pred = predictor.predict_f0(agc_pump(audio, sr, float(depth)))
            ref = sample_reference_f0(t.astype(np.float32), f0_curve, pred.shape[0])
            rows.append(_metric_row(ref, pred, suite="agc", tone_hz=tone, agc_depth_db=depth))
    return rows


def _ffmpeg_roundtrip(audio: np.ndarray, sr: int, codec: str, bitrate_kbps: int) -> Optional[np.ndarray]:
    """Encode/decode through a host ffmpeg subprocess (codec notebook
    ``_ffmpeg_encode_decode``); None when ffmpeg is unavailable."""
    if shutil.which("ffmpeg") is None:
        return None
    from ..io import read_audio, write_wav

    ext = {"libopus": "opus", "libmp3lame": "mp3", "aac": "m4a"}.get(codec, "bin")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "in.wav")
        enc = os.path.join(tmp, f"enc.{ext}")
        dst = os.path.join(tmp, "out.wav")
        write_wav(src, audio, sr)
        try:
            subprocess.run(
                ["ffmpeg", "-y", "-loglevel", "error", "-i", src,
                 "-c:a", codec, "-b:a", f"{bitrate_kbps}k", enc],
                check=True, capture_output=True,
            )
            subprocess.run(
                ["ffmpeg", "-y", "-loglevel", "error", "-i", enc,
                 "-ar", str(sr), "-acodec", "pcm_s16le", dst],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, OSError):
            return None
        decoded, dsr = read_audio(dst)
        if dsr != sr:
            decoded = resample_np(decoded, dsr, sr)
        return decoded[: len(audio)]


def codec_bandwidth_suite(predictor, config: Optional[Dict] = None) -> List[Dict]:
    config = config or {}
    sr = predictor.sample_rate
    duration = float(config.get("duration_seconds", 2.0))
    target_rates = config.get("resample_rates", [8000, 16000, 22050, 32000, 44100])
    codecs = config.get("codecs", [("libopus", 16), ("libopus", 64), ("libmp3lame", 32), ("libmp3lame", 128), ("aac", 32)])

    t = np.arange(int(sr * duration)) / sr
    f0_curve = 196.0 * 2 ** (0.5 * np.sin(2 * np.pi * 0.8 * t))  # slow wander
    audio = synthesize_from_f0_curve(f0_curve, sr)
    baseline_pred = predictor.predict_f0(audio)
    ref = sample_reference_f0(t.astype(np.float32), f0_curve.astype(np.float32), baseline_pred.shape[0])

    rows = [_metric_row(ref, baseline_pred, suite="baseline", condition="clean")]
    for rate in target_rates:
        degraded = resample_np(resample_np(audio, sr, int(rate)), int(rate), sr)[: len(audio)]
        pred = predictor.predict_f0(degraded)
        rows.append(_metric_row(ref, pred, suite="bandwidth", condition=f"roundtrip_{rate}"))
    for codec, kbps in codecs:
        decoded = _ffmpeg_roundtrip(audio, sr, codec, int(kbps))
        if decoded is None:
            rows.append({"suite": "codec", "condition": f"{codec}_{kbps}k", "skipped": "ffmpeg unavailable"})
            continue
        pred = predictor.predict_f0(decoded)
        rows.append(_metric_row(ref, pred, suite="codec", condition=f"{codec}_{kbps}k"))
    return rows


def room_mic_suite(predictor, config: Optional[Dict] = None) -> List[Dict]:
    config = config or {}
    sr = predictor.sample_rate
    duration = float(config.get("duration_seconds", 2.0))
    t60_grid = config.get("t60_grid", [0.15, 0.3, 0.6, 1.0])
    mic_profiles = config.get(
        "mic_profiles",
        [
            {"name": "flat", "stages": []},
            {"name": "telephone", "stages": [
                {"center_freq": 300.0, "gain_db": -12.0}, {"center_freq": 3000.0, "gain_db": 6.0}]},
            {"name": "boomy", "stages": [
                {"center_freq": 120.0, "gain_db": 9.0}, {"center_freq": 5000.0, "gain_db": -6.0}]},
        ],
    )
    t = np.arange(int(sr * duration)) / sr
    f0_curve = 220.0 * 2 ** (0.3 * np.sin(2 * np.pi * 1.0 * t))
    audio = synthesize_from_f0_curve(f0_curve, sr)
    pred0 = predictor.predict_f0(audio)
    ref = sample_reference_f0(t.astype(np.float32), f0_curve.astype(np.float32), pred0.shape[0])

    rows = [_metric_row(ref, pred0, suite="baseline", condition="dry")]
    for i, t60 in enumerate(t60_grid):
        rir = synthesize_rir(sr, float(t60), seed=i)
        pred = predictor.predict_f0(apply_rir(audio, rir))
        rows.append(_metric_row(ref, pred, suite="room", condition=f"t60_{t60}"))
    for profile in mic_profiles:
        pred = predictor.predict_f0(apply_microphone_eq(audio, sr, profile["stages"]))
        rows.append(_metric_row(ref, pred, suite="microphone", condition=profile["name"]))
    return rows


def pitch_range_timbre_suite(predictor, config: Optional[Dict] = None) -> List[Dict]:
    config = config or {}
    sr = predictor.sample_rate
    duration = float(config.get("duration_seconds", 1.5))
    registers = config.get("registers", DEFAULT_REGISTERS)
    timbres = config.get("timbres", DEFAULT_TIMBRES)
    rng = np.random.default_rng(int(config.get("seed", 0)))
    rows = []
    for reg in registers:
        base = float(np.exp(rng.uniform(np.log(reg["fmin"]), np.log(reg["fmax"]))))
        t = np.arange(int(sr * duration)) / sr
        f0_curve = base * 2 ** (0.1 * np.sin(2 * np.pi * 0.7 * t))
        for timbre in timbres:
            phase = np.cumsum(2 * np.pi * f0_curve / sr)
            audio = np.zeros(len(t))
            for k, amp in timbre["partials"]:
                if k * base < sr / 2:
                    audio += amp * np.sin(k * phase)
            peak = np.max(np.abs(audio))
            audio = (0.7 * audio / peak if peak > 0 else audio).astype(np.float32)
            if timbre.get("noise_snr_db") is not None:
                audio = add_noise_snr(audio, float(timbre["noise_snr_db"]))
            pred = predictor.predict_f0(audio)
            ref = sample_reference_f0(t.astype(np.float32), f0_curve.astype(np.float32), pred.shape[0])
            rows.append(
                _metric_row(ref, pred, suite="pitch_range", register=reg["name"],
                            timbre=timbre["name"], base_hz=round(base, 1))
            )
    return rows


def noise_suite(predictor, config: Optional[Dict] = None) -> List[Dict]:
    config = config or {}
    sr = predictor.sample_rate
    duration = float(config.get("duration_seconds", 2.0))
    snrs = config.get("snr_db", [30, 20, 10, 5, 0])
    colors = config.get("colors", ["white", "pink"])
    t = np.arange(int(sr * duration)) / sr
    f0_curve = np.full(len(t), 220.0) * 2 ** (0.2 * np.sin(2 * np.pi * 0.5 * t))
    audio = synthesize_from_f0_curve(f0_curve, sr)
    pred0 = predictor.predict_f0(audio)
    ref = sample_reference_f0(t.astype(np.float32), f0_curve.astype(np.float32), pred0.shape[0])
    rows = [_metric_row(ref, pred0, suite="baseline", condition="clean")]
    for color in colors:
        for snr in snrs:
            pred = predictor.predict_f0(add_noise_snr(audio, float(snr), color=color))
            rows.append(_metric_row(ref, pred, suite="noise", condition=f"{color}_snr{snr}"))
    return rows


def real_audio_suite(predictor, config: Optional[Dict] = None) -> List[Dict]:
    """Degradation sweep over *real* audio from an eval list.

    Mirrors the reference codec/room notebooks' design (SURVEY.md §2.13):
    the reference contour is the training labeler cascade run on the clean
    audio (model-vs-labeler consistency under degradation, not absolute
    truth), then each degradation is applied and re-predicted.
    """
    config = config or {}
    eval_list = config.get("eval_list")
    if not eval_list or not os.path.exists(str(eval_list)):
        return [{"suite": "real_audio", "skipped": f"eval_list not found: {eval_list}"}]

    from ..config import parse_data_list
    from ..dsp.resample import resample_np as _resample
    from ..io import read_audio
    from ..io.audio import AudioDecodeError
    from ..labels import build_f0_extractor

    sr = predictor.sample_rate
    hop = predictor.mel_params["hop_length"]
    max_files = int(config.get("max_files", 20))
    f0_params = config.get("f0_params") or {}
    extractor = build_f0_extractor(sr, hop, config=f0_params, verbose=False)

    with open(str(eval_list), "r", encoding="utf-8") as fh:
        paths = parse_data_list(fh.readlines())[:max_files]

    snrs = config.get("snr_db", [20, 10])
    t60s = config.get("t60_grid", [0.3])
    rates = config.get("resample_rates", [8000, 16000])

    rows: List[Dict] = []
    agg: Dict[str, List[Dict]] = {}
    for path in paths:
        try:
            wave, wsr = read_audio(path)
        except (AudioDecodeError, OSError):
            continue
        if wave.ndim > 1:
            wave = np.mean(wave, axis=-1)
        wave = wave.astype(np.float32)
        if wsr != sr:
            wave = _resample(wave, wsr, sr)
        try:
            reference = extractor.compute(wave, sr).f0.astype(np.float32)
        except Exception:
            continue
        conditions = [("clean", wave)]
        for snr in snrs:
            conditions.append((f"noise_snr{snr}", add_noise_snr(wave, float(snr))))
        for t60 in t60s:
            conditions.append((f"rir_t60_{t60}", apply_rir(wave, synthesize_rir(sr, float(t60)))))
        for rate in rates:
            rt = resample_np(resample_np(wave, sr, int(rate)), int(rate), sr)[: len(wave)]
            conditions.append((f"roundtrip_{rate}", rt))
        for name, degraded in conditions:
            pred = predictor.predict_f0(degraded)
            ref = extractor.align_length(reference, pred.shape[0])
            agg.setdefault(name, []).append(compute_metrics(ref, pred))
    for name, metric_rows in agg.items():
        row: Dict = {"suite": "real_audio", "condition": name, "files": len(metric_rows)}
        for key in ("RPA", "RCA", "VUV", "OctaveError"):
            vals = [m[key] for m in metric_rows if not np.isnan(m[key])]
            row[key] = float(np.mean(vals)) if vals else float("nan")
        rows.append(row)
    return rows


SUITES = {
    "dynamic_pitch": dynamic_pitch_suite,
    "amplitude": amplitude_suite,
    "codec_bandwidth": codec_bandwidth_suite,
    "room_mic": room_mic_suite,
    "pitch_range_timbre": pitch_range_timbre_suite,
    "noise": noise_suite,
    "real_audio": real_audio_suite,
}


def run_all(predictor, output_dir: str, suites=None, config: Optional[Dict] = None):
    """Run suites and write one CSV each (notebook artifact contract).

    ``real_audio`` only runs when explicitly selected or configured with an
    eval list (all other suites use analytic stimuli).
    """
    os.makedirs(output_dir, exist_ok=True)
    config = config or {}
    if suites is None:
        suites = [
            name
            for name in SUITES
            if name != "real_audio" or (config.get("real_audio") or {}).get("eval_list")
        ]
    results = {}
    for name in suites:
        rows = SUITES[name](predictor, config.get(name))
        results[name] = rows
        _write_csv(os.path.join(output_dir, f"{name}_metrics.csv"), rows)
    return results


def _write_csv(path: str, rows: List[Dict]) -> None:
    import csv

    if not rows:
        return
    keys = []
    for row in rows:
        for key in row:
            if key not in keys:
                keys.append(key)
    with open(path, "w", newline="", encoding="utf-8") as fh:
        writer = csv.DictWriter(fh, fieldnames=keys)
        writer.writeheader()
        writer.writerows(rows)
