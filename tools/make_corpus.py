#!/usr/bin/env python
"""Generate a training corpus with exact analytic F0 labels.

Utterances come from the framework's own harmonic synthesizer
(data/synthetic.py): a vowel-formant majority plus a pure-tone /
sparse-partial share (round-2 domain-gap fix — the robustness suites
evaluate on single-partial sines).  Each file is written as WAV with its
analytic contour in the legacy ``_f0.npy`` cache format (loaded verbatim by
the data layer, reference meldataset.py:598-603), so training supervision is
exact by construction.

Usage:
  python tools/make_corpus.py --root Data/corpus_r2 [--n 300] [--tone-share 0.4]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np

SR = 24000
HOP = 300


def make_corpus(
    root: str,
    n: int = 300,
    n_val: int = 40,
    tone_share: float = 0.4,
    seed: int = 11,
    min_duration: float = 2.6,
    max_duration: float = 3.2,
) -> dict:
    from pitchextractor_tpu.data.synthetic import HarmonicSynthesizer
    from pitchextractor_tpu.io import write_wav

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)

    base_cfg = {
        "duration": {"min": min_duration, "max": max_duration},
        "pitch_range": [80.0, 500.0],
        "pitch_log_uniform": True,
        "gain_db_range": [-18.0, -6.0],
        "noise_db": -50.0,
        "modulation": {
            "vibrato_probability": 0.5,
            "vibrato_semitones": 0.5,
            "vibrato_rate_range": [4.0, 8.0],
            "max_segments": 5,
        },
    }
    vowel_synth = HarmonicSynthesizer(SR, HOP, 1024, config=base_cfg, rng=rng)
    tone_synth = HarmonicSynthesizer(
        SR,
        HOP,
        1024,
        config={**base_cfg, "tone_probability": 1.0, "tone_partials_max": 4},
        rng=rng,
    )

    total = n + n_val
    paths = []
    for i in range(total):
        synth = tone_synth if rng.random() < tone_share else vowel_synth
        wave, contour = synth.generate()
        # silence head/tail so voicing boundaries are trained too
        lead = int(SR * rng.uniform(0.05, 0.25))
        trail = int(SR * rng.uniform(0.05, 0.25))
        wave = np.concatenate([np.zeros(lead, np.float32), wave, np.zeros(trail, np.float32)])
        lead_frames = lead // HOP
        contour = np.concatenate(
            [
                np.zeros(lead_frames, np.float32),
                contour,
                np.zeros(1 + len(wave) // HOP - lead_frames - len(contour), np.float32),
            ]
        )
        path = os.path.join(root, f"utt_{i:04d}.wav")
        write_wav(path, wave, SR)
        np.save(path + "_f0.npy", contour.astype(np.float32))
        paths.append(path)

    order = rng.permutation(total)
    train_paths = [paths[i] for i in order[:n]]
    val_paths = [paths[i] for i in order[n:]]
    with open(os.path.join(root, "train_list.txt"), "w") as fh:
        fh.writelines(p + "|x\n" for p in train_paths)
    with open(os.path.join(root, "val_list.txt"), "w") as fh:
        fh.writelines(p + "|x\n" for p in val_paths)
    return {"train": len(train_paths), "val": len(val_paths), "root": root}


@click.command()
@click.option("--root", required=True, type=str)
@click.option("--n", default=300, type=int)
@click.option("--n-val", default=40, type=int)
@click.option("--tone-share", default=0.4, type=float)
@click.option("--seed", default=11, type=int)
def main(root, n, n_val, tone_share, seed):
    print(make_corpus(root, n, n_val, tone_share, seed))


if __name__ == "__main__":
    main()
