#!/usr/bin/env python
"""Measure the temporal offset between stored corpus F0 labels and the
framework's own jax_ac tracker (which scores RPA 0.90+ on the dynamic-pitch
grid through the eval machinery, i.e. is aligned with the eval reference
convention).

If the labels lead/lag the tracker by a consistent sub-frame amount, the
training supervision is teaching the model a systematic temporal shift —
the vibrato-diagnostic's observed ~20 ms phase lead
(tools/diagnose_vibrato.py, results/round2/vibrato_diag_e.csv).

For each file: cents contours of label and tracker on mutually voiced
frames, cross-correlated over integer shifts with parabolic sub-frame
refinement.  Positive shift = label contour occurs LATER than the tracker's
(label[t] matches tracker[t+shift]).

Usage:
  python tools/check_label_alignment.py --list Data/corpus_r2e/train_list.txt --n 8
"""

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np


def best_shift(a: np.ndarray, b: np.ndarray, voiced: np.ndarray, max_shift: int = 5):
    """Shift s maximizing agreement of a[t] with b[t+s] (cents contours)."""
    scores = []
    shifts = range(-max_shift, max_shift + 1)
    for s in shifts:
        if s >= 0:
            av, bv, m = a[: len(a) - s], b[s:], voiced[: len(a) - s] & (voiced[s:] if s else voiced)
        else:
            av, bv = a[-s:], b[: len(b) + s]
            m = voiced[-s:] & voiced[: len(b) + s]
        if m.sum() < 20:
            scores.append(-np.inf)
            continue
        d = av[m] - bv[m]
        scores.append(-float(np.mean(d * d)))
    scores = np.asarray(scores)
    i = int(np.argmax(scores))
    s0 = list(shifts)[i]
    # parabolic refinement on the negative-MSE peak
    if 0 < i < len(scores) - 1 and np.isfinite(scores[i - 1]) and np.isfinite(scores[i + 1]):
        denom = scores[i - 1] - 2 * scores[i] + scores[i + 1]
        if denom < 0:
            s0 = s0 + 0.5 * (scores[i - 1] - scores[i + 1]) / denom
    return float(s0), float(np.sqrt(-scores[i]))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--list", required=True)
    parser.add_argument("--n", type=int, default=8)
    parser.add_argument("--platform", default="cpu")
    args = parser.parse_args()

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pitchextractor_tpu.io import read_audio
    from pitchextractor_tpu.labels import build_f0_extractor

    paths = [
        line.split("|")[0]
        for line in open(args.list).read().splitlines()
        if line
    ]
    rng = np.random.default_rng(3)
    rng.shuffle(paths)

    extractor = build_f0_extractor(
        24000, 300, {"backend_order": ["jax_ac"], "backends": {"jax_ac": {"enabled": True}}}
    )
    shifts = []
    checked = 0
    for path in paths:
        if checked >= args.n:
            break
        label = np.load(path + "_f0.npy")
        audio, sr = read_audio(path)
        tracked = extractor.compute(np.asarray(audio, np.float32), sr=sr).f0
        n = min(len(label), len(tracked))
        lab, trk = label[:n], np.asarray(tracked[:n], np.float64)
        voiced = (lab > 0) & (trk > 0)
        if voiced.sum() < 50:
            continue
        lab_c = 1200.0 * np.log2(np.maximum(lab, 1.0) / 55.0)
        trk_c = 1200.0 * np.log2(np.maximum(trk, 1.0) / 55.0)
        # only meaningful if the contour actually moves
        if np.std(lab_c[voiced]) < 30:
            continue
        s, rms = best_shift(lab_c, trk_c, voiced)
        shifts.append(s)
        checked += 1
        print(f"{os.path.basename(path)}: shift {s:+.2f} frames ({s * 12.5:+.1f} ms), residual {rms:.1f} cents")

    if shifts:
        print(
            f"\nmean shift: {np.mean(shifts):+.2f} frames ({np.mean(shifts) * 12.5:+.1f} ms); "
            f"positive = stored labels LATE vs tracker"
        )


if __name__ == "__main__":
    main()
