"""Scripted robustness-evaluation suites, batched end to end.

1:1 replacements for the reference's six Jupyter notebooks (SURVEY.md
§2.13), runnable headless as the integration test layer the reference lacks
(SURVEY.md §4).  TPU-first dataflow: each sweep synthesizes its whole
stimulus grid as one on-device bank (``stimuli.render_bank``), applies host
degradations where the notebook does (clipping/AGC/codecs/RIR/EQ/noise),
runs **one batched inference dispatch per sweep**
(``predictor.predict_f0_batch``), and scores all contours with the
vectorized batch metrics — no per-stimulus host loops.

Suites:
- dynamic_pitch     vibrato rate × depth sweep + glide sweep
                    (Utils/dynamic_pitch_behavior.ipynb)
- amplitude         clean tones under sample clipping and AGC pumping
                    (Utils/amplitude_pathologies.ipynb)
- codec_bandwidth   resample round-trips 8-44.1 kHz; ffmpeg codecs when the
                    binary exists (Utils/codec_and_bandwidth_torture.ipynb)
- room_mic          synthetic-RIR convolution (T60 grid) and cascaded
                    mic-EQ coloration (Utils/room_and_microphone_stress.ipynb)
- pitch_range_timbre  vocal registers × harmonic timbre profiles
                    (Utils/pitch_range_and_timbre_coverage.ipynb)
- noise             white/pink additive-noise SNR sweep
                    (Utils/noise_robustness_evaluation.ipynb — corrupted in
                    the reference snapshot; reconstructed per its pattern)
- real_audio        degradations over a real eval list, reference contours
                    from the training cascade (codec/room notebook design)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..dsp.filters import (
    add_noise_snr,
    agc_pump,
    apply_microphone_eq,
    apply_rir,
    clip_audio,
    synthesize_rir,
)
from ..dsp.codec_proxy import PROXY_CODECS
from ..dsp.resample import resample_np
from .metrics import (
    batch_metrics,
    batch_overshoot_cents,
    batch_tracking_delay_ms,
)
from .stimuli import (
    StimulusBank,
    glide_bank,
    harmonic_bank,
    render_bank,
    tone_bank,
    vibrato_bank,
    wander_curve,
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


# ------------------------------------------------------------------ engine
def _hop(predictor) -> int:
    """Model hop in samples for exact frame-time references (0 = unknown,
    fall back to the upstream notebooks' compressed timing)."""
    mel_params = getattr(predictor, "mel_params", None) or {}
    return int(mel_params.get("hop_length", 0) or 0)


def _predict_batch(predictor, waveforms: Sequence[np.ndarray]) -> List[np.ndarray]:
    """One batched dispatch when the predictor supports it."""
    batched = getattr(predictor, "predict_f0_batch", None)
    if batched is not None:
        return batched(list(waveforms))
    return [np.asarray(predictor.predict_f0(w)) for w in waveforms]


def _score(
    refs: Sequence[np.ndarray],
    preds: Sequence[np.ndarray],
    tags: Sequence[Dict],
    frame_period_ms: Optional[float] = None,
    overshoot: bool = False,
) -> List[Dict]:
    """Vectorized scoring: rows are grouped by contour length so each group
    is one ``batch_metrics`` call over an (N, T) stack."""
    rows: List[Optional[Dict]] = [None] * len(refs)
    by_len: Dict[int, List[int]] = {}
    for i, (r, p) in enumerate(zip(refs, preds)):
        by_len.setdefault(min(len(r), len(p)), []).append(i)
    for t, idxs in by_len.items():
        ref = np.stack([np.asarray(refs[i][:t], dtype=np.float64) for i in idxs])
        pred = np.stack([np.asarray(preds[i][:t], dtype=np.float64) for i in idxs])
        metrics = batch_metrics(ref, pred)
        lag = (
            batch_tracking_delay_ms(ref, pred, frame_period_ms)
            if frame_period_ms is not None
            else None
        )
        over = batch_overshoot_cents(ref, pred) if overshoot else None
        for j, i in enumerate(idxs):
            row = dict(tags[i])
            for key in ("RPA", "RCA", "VUV", "OctaveError", "RMSE_cents"):
                row[key] = float(metrics[key][j])
            if lag is not None:
                row["Lag_ms"] = float(lag[j])
            if over is not None:
                row["Overshoot_cents"] = float(over[j])
            rows[i] = row
    return [row for row in rows if row is not None]


def _run_bank(
    predictor,
    bank: StimulusBank,
    tags: Sequence[Dict],
    degrade=None,
    frame_period_ms: Optional[float] = None,
    overshoot: bool = False,
) -> List[Dict]:
    """Predict a whole bank in one dispatch and score it.

    ``degrade``: optional per-row host transform (waveform, row_index) ->
    waveform, applied between synthesis and prediction.
    """
    waves = bank.waveforms()
    if degrade is not None:
        waves = [degrade(w, i) for i, w in enumerate(waves)]
    preds = _predict_batch(predictor, waves)
    hop = _hop(predictor)
    refs = [bank.frame_reference_row(i, len(preds[i]), hop) for i in range(len(bank))]
    return _score(refs, preds, tags, frame_period_ms=frame_period_ms, overshoot=overshoot)


# ------------------------------------------------------------------ suites
def dynamic_pitch_suite(predictor, config: Optional[Dict] = None) -> List[Dict]:
    config = config or {}
    sr = predictor.sample_rate

    vib = {**DEFAULT_VIBRATO, **(config.get("vibrato") or {})}
    bank, grid = vibrato_bank(
        [float(r) for r in vib["rates_hz"]],
        [float(d) for d in vib["depth_cents"]],
        float(vib["base_frequency_hz"]),
        float(vib["duration_seconds"]),
        sr,
    )
    tags = [{"suite": "vibrato", **g} for g in grid]
    rows = _run_bank(predictor, bank, tags)

    glide = {**DEFAULT_GLIDE, **(config.get("glide") or {})}
    gbank, gtags = glide_bank(
        [float(d) for d in glide["durations_seconds"]],
        float(glide["start_hz"]),
        float(glide["end_hz"]),
        sr,
    )
    rows += _run_bank(
        predictor,
        gbank,
        [{"suite": "glide", **g} for g in gtags],
        frame_period_ms=predictor.frame_period_ms,
        overshoot=True,
    )
    return rows


def amplitude_suite(predictor, config: Optional[Dict] = None) -> List[Dict]:
    config = config or {}
    sr = predictor.sample_rate
    tones = [float(f) for f in config.get("tones_hz", [110.0, 220.0, 440.0])]
    clip_fractions = config.get("clip_fractions", [0.0, 0.01, 0.03, 0.05, 0.10])
    pump_depths = config.get("agc_depths_db", [0.0, 3.0, 6.0, 10.0])
    duration = float(config.get("duration_seconds", 2.0))

    base = tone_bank(tones, duration, sr)
    # expand: every tone × every degradation is one row of a single batch
    waves: List[np.ndarray] = []
    refs_idx: List[int] = []
    tags: List[Dict] = []
    for i, tone in enumerate(tones):
        clean = base.audio[i, : base.lengths[i]]
        for frac in clip_fractions:
            waves.append(clip_audio(clean, float(frac)))
            refs_idx.append(i)
            tags.append({"suite": "clipping", "tone_hz": tone, "clip_fraction": frac})
        for depth in pump_depths:
            waves.append(agc_pump(clean, sr, float(depth)))
            refs_idx.append(i)
            tags.append({"suite": "agc", "tone_hz": tone, "agc_depth_db": depth})
    preds = _predict_batch(predictor, waves)
    refs = [base.frame_reference_row(refs_idx[k], len(preds[k]), _hop(predictor)) for k in range(len(waves))]
    return _score(refs, preds, tags)


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
    """Resample round trips + REAL codecs + in-tree codec proxies.

    Real-codec rows (``suite: codec``) run through the in-image codec
    *libraries* first (io/codecs_native.py — LAME/mpg123 for mp3, libopus
    for opus: the same codecs ffmpeg would drive, bound in-process), then
    fall back to an ffmpeg binary when present (reference codec notebook
    cells 4, 9); a codec with neither backend records a skipped row.  The
    proxy rows (``suite: codec_proxy``, dsp/codec_proxy.py — μ-law/A-law
    companding and bitrate-proportional MDCT quantization) always run, so
    the codec degradation family executes on every host.  The families are
    reported separately — proxies never masquerade as real codecs.
    """
    config = config or {}
    sr = predictor.sample_rate
    duration = float(config.get("duration_seconds", 2.0))
    target_rates = config.get("resample_rates", [8000, 16000, 22050, 32000, 44100])
    codecs = config.get(
        "codecs",
        # the reference notebook's list (opus/mp3/aac) + an extra real
        # Layer-II row the in-image libraries make free (io/codecs_native.py)
        [("libopus", 16), ("libopus", 64), ("libmp3lame", 32), ("libmp3lame", 128),
         ("libtwolame", 64), ("aac", 32), ("aac", 128)],
    )
    proxy_specs = config.get(
        "proxy_codecs",
        [("mulaw", 8), ("alaw", 8), ("mdct", 16), ("mdct", 32), ("mdct", 64), ("mdct", 128)],
    )

    curve = wander_curve(196.0, 0.5, 0.8, duration, sr)
    bank = render_bank(curve, [len(curve)], sr)
    clean = bank.audio[0]

    waves = [clean]
    tags: List[Dict] = [{"suite": "baseline", "condition": "clean"}]
    skipped: List[Dict] = []
    for rate in target_rates:
        waves.append(resample_np(resample_np(clean, sr, int(rate)), int(rate), sr)[: len(clean)])
        tags.append({"suite": "bandwidth", "condition": f"roundtrip_{rate}"})
    from ..io.codecs_native import codec_roundtrip as _native_roundtrip

    for codec, kbps in codecs:
        decoded = _native_roundtrip(clean, sr, codec, int(kbps))
        backend = "native"
        if decoded is None:
            decoded = _ffmpeg_roundtrip(clean, sr, codec, int(kbps))
            backend = "ffmpeg"
        if decoded is None:
            skipped.append(
                {"suite": "codec", "condition": f"{codec}_{kbps}k",
                 "skipped": "no codec backend (native lib or ffmpeg)"}
            )
            continue
        waves.append(decoded)
        tags.append({"suite": "codec", "condition": f"{codec}_{kbps}k", "backend": backend})
    for name, param in proxy_specs:
        fn = PROXY_CODECS.get(str(name))
        if fn is None:
            skipped.append(
                {"suite": "codec_proxy", "condition": f"proxy_{name}_{param}",
                 "skipped": f"unknown proxy codec {name!r}"}
            )
            continue
        unit = "bit" if str(name) in ("mulaw", "alaw") else "k"
        waves.append(np.asarray(fn(clean, sr, param), dtype=np.float32)[: len(clean)])
        tags.append({"suite": "codec_proxy", "condition": f"proxy_{name}_{param}{unit}"})
    preds = _predict_batch(predictor, waves)
    refs = [bank.frame_reference_row(0, len(p), _hop(predictor)) for p in preds]
    return _score(refs, preds, tags) + skipped


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
    curve = wander_curve(220.0, 0.3, 1.0, duration, sr)
    bank = render_bank(curve, [len(curve)], sr)
    clean = bank.audio[0]

    waves = [clean]
    tags: List[Dict] = [{"suite": "baseline", "condition": "dry"}]
    for i, t60 in enumerate(t60_grid):
        waves.append(apply_rir(clean, synthesize_rir(sr, float(t60), seed=i)))
        tags.append({"suite": "room", "condition": f"t60_{t60}"})
    for profile in mic_profiles:
        waves.append(apply_microphone_eq(clean, sr, profile["stages"]))
        tags.append({"suite": "microphone", "condition": profile["name"]})
    preds = _predict_batch(predictor, waves)
    refs = [bank.frame_reference_row(0, len(p), _hop(predictor)) for p in preds]
    return _score(refs, preds, tags)


def pitch_range_timbre_suite(predictor, config: Optional[Dict] = None) -> List[Dict]:
    config = config or {}
    sr = predictor.sample_rate
    duration = float(config.get("duration_seconds", 1.5))
    registers = config.get("registers", DEFAULT_REGISTERS)
    timbres = config.get("timbres", DEFAULT_TIMBRES)
    rng = np.random.default_rng(int(config.get("seed", 0)))

    curves: List[np.ndarray] = []
    partials: List[List[Tuple[int, float]]] = []
    noise_db: List[Optional[float]] = []
    tags: List[Dict] = []
    for reg in registers:
        base = float(np.exp(rng.uniform(np.log(reg["fmin"]), np.log(reg["fmax"]))))
        curve = wander_curve(base, 0.1, 0.7, duration, sr)
        for timbre in timbres:
            curves.append(curve)
            partials.append([(int(k), float(a)) for k, a in timbre["partials"]])
            noise_db.append(timbre.get("noise_snr_db"))
            tags.append(
                {"suite": "pitch_range", "register": reg["name"],
                 "timbre": timbre["name"], "base_hz": round(base, 1)}
            )

    bank = harmonic_bank(np.stack(curves), partials, sr)

    def degrade(wave, i):
        return add_noise_snr(wave, float(noise_db[i])) if noise_db[i] is not None else wave

    return _run_bank(predictor, bank, tags, degrade=degrade)


def noise_suite(predictor, config: Optional[Dict] = None) -> List[Dict]:
    config = config or {}
    sr = predictor.sample_rate
    duration = float(config.get("duration_seconds", 2.0))
    snrs = config.get("snr_db", [30, 20, 10, 5, 0])
    colors = config.get("colors", ["white", "pink"])

    curve = wander_curve(220.0, 0.2, 0.5, duration, sr)
    bank = render_bank(curve, [len(curve)], sr)
    clean = bank.audio[0]

    waves = [clean]
    tags: List[Dict] = [{"suite": "baseline", "condition": "clean"}]
    for color in colors:
        for snr in snrs:
            waves.append(add_noise_snr(clean, float(snr), color=color))
            tags.append({"suite": "noise", "condition": f"{color}_snr{snr}"})
    preds = _predict_batch(predictor, waves)
    refs = [bank.frame_reference_row(0, len(p), _hop(predictor)) for p in preds]
    return _score(refs, preds, tags)


def real_audio_suite(predictor, config: Optional[Dict] = None) -> List[Dict]:
    """Degradation sweep over *real* audio from an eval list.

    Mirrors the reference codec/room notebooks' design (SURVEY.md §2.13):
    the reference contour is the training labeler cascade on the clean
    audio (model-vs-labeler consistency under degradation, not absolute
    truth).  Cascade labels and model predictions both run as batched
    device dispatches (EvalLabeler.contour_batch / predict_f0_batch).
    """
    config = config or {}
    eval_list = config.get("eval_list")
    if not eval_list or not os.path.exists(str(eval_list)):
        return [{"suite": "real_audio", "skipped": f"eval_list not found: {eval_list}"}]

    from ..config import parse_data_list
    from ..io import read_audio
    from ..io.audio import AudioDecodeError
    from .labeling import EvalLabeler

    sr = predictor.sample_rate
    hop = predictor.mel_params["hop_length"]
    max_files = int(config.get("max_files", 20))
    labeler = EvalLabeler(
        mel_params={"sample_rate": sr, "hop_length": hop},
        f0_params=config.get("f0_params") or {},
    )

    with open(str(eval_list), "r", encoding="utf-8") as fh:
        paths = parse_data_list(fh.readlines())[:max_files]

    waves: List[np.ndarray] = []
    for path in paths:
        try:
            wave, wsr = read_audio(path)
        except (AudioDecodeError, OSError):
            continue
        if wave.ndim > 1:
            wave = np.mean(wave, axis=-1)
        wave = wave.astype(np.float32)
        if wsr != sr:
            wave = resample_np(wave, wsr, sr)
        waves.append(wave)
    if not waves:
        return [{"suite": "real_audio", "skipped": "no readable files"}]

    references = labeler.contour_batch(waves)

    snrs = config.get("snr_db", [20, 10])
    t60s = config.get("t60_grid", [0.3])
    rates = config.get("resample_rates", [8000, 16000])
    conditions = [("clean", lambda w: w)]
    conditions += [
        (f"noise_snr{snr}", lambda w, s=snr: add_noise_snr(w, float(s))) for snr in snrs
    ]
    conditions += [
        (f"rir_t60_{t60}", lambda w, t=t60: apply_rir(w, synthesize_rir(sr, float(t))))
        for t60 in t60s
    ]
    conditions += [
        (
            f"roundtrip_{rate}",
            lambda w, r=rate: resample_np(resample_np(w, sr, int(r)), int(r), sr)[: len(w)],
        )
        for rate in rates
    ]

    rows: List[Dict] = []
    for name, fn in conditions:
        preds = _predict_batch(predictor, [fn(w) for w in waves])
        refs = [labeler.extractor.align_length(r, len(p)) for r, p in zip(references, preds)]
        per_file = _score(refs, preds, [{} for _ in preds])
        row: Dict = {"suite": "real_audio", "condition": name, "files": len(per_file)}
        for key in ("RPA", "RCA", "VUV", "OctaveError"):
            vals = [m[key] for m in per_file if not np.isnan(m[key])]
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
