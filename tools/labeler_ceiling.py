#!/usr/bin/env python
"""Labeler ceiling on the dynamic-pitch grid: is deep vibrato winnable?

RESULTS.md attributes the trained model's low RPA on the 120-200 cent
vibrato rows to analysis-window smear (1024 samples / 42.7 ms at 24 kHz).
This experiment measures what dedicated F0 trackers — which see raw audio,
not the mel front-end — achieve on the exact suite grid
(eval/stimuli.vibrato_bank / glide_bank, mirroring
Utils/dynamic_pitch_behavior.ipynb cells 4/9): if the best tracker also
fails the deep rows, the per-frame +/-50 cent criterion is genuinely
window-limited there; if a tracker passes, the model has headroom and the
claim is overstated.

Usage:
  python tools/labeler_ceiling.py [--backends jax_ac,jax_pyin,crepe,swiftf0]
                                  [--csv results/round2/labeler_ceiling.csv]
"""

import argparse
import csv
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

SR = 24000
HOP = 300

RATES = (4.0, 6.0, 8.0)
DEPTHS = (20.0, 60.0, 120.0, 200.0)
BASE_HZ = 220.0
VIB_DURATION = 2.0
GLIDE_DURATIONS = (0.4, 0.8, 1.6, 3.2)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--backends", default="jax_ac,jax_pyin,crepe,swiftf0")
    parser.add_argument("--csv", default="results/round2/labeler_ceiling.csv")
    parser.add_argument(
        "--platform",
        default="cpu",
        help="'cpu' (default; never steals the TPU from a training run) or 'axon'",
    )
    args = parser.parse_args()

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pitchextractor_tpu.dsp.filters import (
        apply_microphone_eq,
        apply_rir,
        synthesize_rir,
    )
    from pitchextractor_tpu.eval.metrics import compute_metrics, rms_cents_error
    from pitchextractor_tpu.eval.stimuli import (
        glide_bank,
        render_bank,
        vibrato_bank,
        wander_curve,
    )
    from pitchextractor_tpu.labels import build_f0_extractor

    vib_bank, vib_tags = vibrato_bank(RATES, DEPTHS, BASE_HZ, VIB_DURATION, SR)
    gli_bank, gli_tags = glide_bank(GLIDE_DURATIONS, 60.0, 500.0, SR)

    # room/mic grid (round-3 VERDICT #6): identical stimulus + degradations
    # to eval/suites.room_mic_suite, so the trackers' RPA here IS the oracle
    # ceiling for the suite's t60/mic rows (the t60 0.6 plateau question)
    room_curve = wander_curve(220.0, 0.3, 1.0, 2.0, SR)
    room_bank = render_bank(room_curve, [len(room_curve)], SR)
    room_clean = room_bank.audio[0]
    room_waves = [("dry", room_clean)]
    for i, t60 in enumerate((0.15, 0.3, 0.6, 1.0)):
        room_waves.append(
            (f"t60_{t60}", apply_rir(room_clean, synthesize_rir(SR, float(t60), seed=i)))
        )
    for pname, stages in (
        ("telephone", [{"center_freq": 300.0, "gain_db": -12.0},
                       {"center_freq": 3000.0, "gain_db": 6.0}]),
        ("boomy", [{"center_freq": 120.0, "gain_db": 9.0},
                   {"center_freq": 5000.0, "gain_db": -6.0}]),
    ):
        room_waves.append((pname, apply_microphone_eq(room_clean, SR, stages)))

    rows = []
    for name in args.backends.split(","):
        name = name.strip()
        config = {"backend_order": [name], "backends": {name: {"enabled": True}}}
        try:
            ext = build_f0_extractor(SR, HOP, config, verbose=False)
        except Exception as exc:  # backend unavailable in this image
            print(f"[skip] {name}: {exc}")
            continue
        if not ext.backends:
            print(f"[skip] {name}: no usable backend ({ext.describe_skipped_backends()})")
            continue
        for bank, tags, suite in (
            (vib_bank, vib_tags, "vibrato"),
            (gli_bank, gli_tags, "glide"),
        ):
            waveforms = bank.waveforms()
            for i, tag in enumerate(tags):
                audio = np.asarray(waveforms[i], dtype=np.float32)
                n_frames = 1 + len(audio) // HOP
                ref = bank.frame_reference_row(i, n_frames, HOP)
                try:
                    res = ext.compute(audio, SR)
                    pred = ext.align_length(res.f0, n_frames)
                except Exception as exc:
                    print(f"[fail] {name} {suite} {tag}: {exc}")
                    continue
                m = compute_metrics(ref, np.asarray(pred))
                rows.append(
                    {
                        "backend": name,
                        "suite": suite,
                        **tag,
                        "RPA": round(float(m["RPA"]), 4),
                        "RMSE_cents": round(rms_cents_error(ref, np.asarray(pred)), 1),
                    }
                )
                print(rows[-1], flush=True)
        for condition, audio in room_waves:
            audio = np.asarray(audio, dtype=np.float32)
            n_frames = 1 + len(audio) // HOP
            ref = room_bank.frame_reference_row(0, n_frames, HOP)
            try:
                res = ext.compute(audio, SR)
                pred = ext.align_length(res.f0, n_frames)
            except Exception as exc:
                print(f"[fail] {name} room {condition}: {exc}")
                continue
            m = compute_metrics(ref, np.asarray(pred))
            rows.append(
                {
                    "backend": name,
                    "suite": "room_mic",
                    "condition": condition,
                    "RPA": round(float(m["RPA"]), 4),
                    "RMSE_cents": round(rms_cents_error(ref, np.asarray(pred)), 1),
                }
            )
            print(rows[-1], flush=True)

    os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
    keys = ["backend", "suite", "rate_hz", "depth_cents", "duration_s", "condition", "RPA", "RMSE_cents"]
    with open(args.csv, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=keys)
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {args.csv} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
