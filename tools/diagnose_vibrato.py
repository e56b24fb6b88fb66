#!/usr/bin/env python
"""Vibrato tracking diagnostic: gain / phase-lag / chunk-boundary analysis.

The dynamic-pitch suite (eval/suites.py, reference
Utils/dynamic_pitch_behavior.ipynb) shows the trained model failing the
60-200 cent vibrato rows at 6-8 Hz with the flat-contour RPA signature.
RPA alone cannot distinguish the three candidate causes:

  (a) amplitude attenuation  — the model low-pass-filters the contour
      (gain < 1): a *training* problem, fixable with corpus emphasis;
  (b) phase lag              — tracking with a constant delay phi: at 8 Hz a
      1.5-frame lag alone breaks the 50-cent gate even at gain 1;
  (c) chunk-boundary cold start — keep-first-stride stitching
      (infer/predict.py _stitch, reference notebooks' predict_f0) gives the
      first kept frames of every chunk no left context, so the forward LSTM
      re-converges mid-file once per 144 frames: an *inference* problem.

This tool projects the predicted cents-contour of each (rate, depth) row
onto sin/cos at the known vibrato rate (least squares), reporting per row:
gain alpha, lag in ms and frames, residual RMS after removing the fitted
sinusoid, and the |error| profile by position-within-chunk (first kept
frames vs interior) to expose (c) directly.

Usage:
  python tools/diagnose_vibrato.py --checkpoint results/round2/flagship_e/epoch_00600.ckpt \
      [--platform cpu] [--csv results/round2/vibrato_diag.csv]
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
BASE_HZ = 220.0  # suite default (eval/suites.py DYNAMIC_PITCH_DEFAULTS)
DURATION = 3.0


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--platform", default="cpu")
    parser.add_argument("--csv", default=None)
    parser.add_argument("--rates", default="4,6,8")
    parser.add_argument("--depths", default="60,120,200")
    args = parser.parse_args()

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pitchextractor_tpu.eval.stimuli import vibrato_bank
    from pitchextractor_tpu.infer import F0Predictor, load_model

    rates = [float(r) for r in args.rates.split(",")]
    depths = [float(d) for d in args.depths.split(",")]
    bank, tags = vibrato_bank(rates, depths, BASE_HZ, DURATION, SR)

    model, variables = load_model(args.checkpoint)
    predictor = F0Predictor(model, variables)
    preds = predictor.predict_f0_batch(bank.waveforms(), sr=SR)

    chunk_stride = predictor.chunk_size - predictor.overlap  # 144
    rows = []
    for tag, pred, truth_curve in zip(tags, preds, bank.f0):
        n = len(pred)
        t = np.arange(n) * HOP / SR
        truth = truth_curve[np.minimum(np.arange(n) * HOP, len(truth_curve) - 1)]
        voiced = (truth > 0) & (pred > 10.0)
        # trim fade regions: keep frames where truth is voiced, away from edges
        interior = voiced.copy()
        interior[:8] = False
        interior[-8:] = False

        pred_cents = 1200.0 * np.log2(np.maximum(pred, 1.0) / BASE_HZ)
        rate, depth = tag["rate_hz"], tag["depth_cents"]
        ref_phase = 2.0 * np.pi * rate * t
        # least-squares projection: pred_cents ~ a*sin + b*cos + c
        A = np.stack([np.sin(ref_phase), np.cos(ref_phase), np.ones(n)], axis=1)
        coef, *_ = np.linalg.lstsq(A[interior], pred_cents[interior], rcond=None)
        a, b, c = coef
        gain = float(np.hypot(a, b) / depth)
        # truth is depth*sin(ref_phase); lag phi solves a+bi = depth*gain*e^{-i phi}
        phi = float(np.arctan2(-b, a))
        lag_ms = phi / (2.0 * np.pi * rate) * 1000.0
        fitted = A @ coef
        resid_rms = float(np.sqrt(np.mean((pred_cents[interior] - fitted[interior]) ** 2)))

        err = np.abs(pred_cents - 1200.0 * np.log2(np.maximum(truth, 1.0) / BASE_HZ))
        pos = np.arange(n) % chunk_stride
        head = interior & (pos < 12)
        tail = interior & (pos >= 12)
        head_err = float(np.mean(err[head])) if head.any() else float("nan")
        tail_err = float(np.mean(err[tail])) if tail.any() else float("nan")
        rpa = float(np.mean(err[voiced] <= 50.0)) if voiced.any() else float("nan")

        rows.append(
            {
                "rate_hz": rate,
                "depth_cents": depth,
                "RPA": round(rpa, 3),
                "gain": round(gain, 3),
                "lag_ms": round(lag_ms, 1),
                "lag_frames": round(lag_ms / (1000.0 * HOP / SR), 2),
                "resid_rms_cents": round(resid_rms, 1),
                "chunk_head_err_cents": round(head_err, 1),
                "interior_err_cents": round(tail_err, 1),
            }
        )

    header = list(rows[0].keys())
    widths = [max(len(h), 8) for h in header]
    print("  ".join(h.ljust(w) for h, w in zip(header, widths)))
    for r in rows:
        print("  ".join(str(r[h]).ljust(w) for h, w in zip(header, widths)))

    if args.csv:
        os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
        with open(args.csv, "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=header)
            writer.writeheader()
            writer.writerows(rows)
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
