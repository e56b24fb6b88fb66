"""F0-prediction CLI — a first-class command for the reference's notebook
``predict_f0`` workflow (e.g. dynamic_pitch_behavior.ipynb cell 5: load the
newest checkpoint, chunked 192/48 inference, contour out).

Installed as ``pitchextractor-infer``.  Batched: all inputs of one padded
length bucket share a single compiled model apply
(``F0Predictor.predict_f0_batch``), so labeling a directory rides the TPU
instead of a per-file host loop.

Outputs, per input ``name.wav``:
  - ``name_f0.npy``  — float32 contour in Hz, one value per mel frame
  - ``name_f0.csv``  — (``--format csv``) time_s,f0_hz,voiced rows
"""

from __future__ import annotations

import json
import os

import click
import numpy as np


def _gather_inputs(wavs, list_path):
    paths = list(wavs)
    if list_path:
        with open(list_path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    # training-list format is "path|label"; take the path
                    paths.append(line.split("|")[0])
    return paths


@click.command()
@click.argument("wavs", nargs=-1, type=str)
@click.option("--list", "list_path", default=None, type=str, help="file with one wav path (or path|label) per line")
@click.option("--checkpoint", default=None, type=str)
@click.option("--checkpoint_dir", default="Checkpoint", type=str)
@click.option("--config_path", default="./Configs/config.yml", type=str)
@click.option("--output_dir", default=None, type=str, help="default: alongside each input")
@click.option("--format", "fmt", default="npy", type=click.Choice(["npy", "csv"]))
@click.option("--voicing_threshold_hz", default=10.0, type=float, help="eval-suite voicing rule (notebooks CONFIG)")
@click.option("--octave_correct", is_flag=True, help="opt-in octave-flip post-filter")
@click.option("--legacy_concat", is_flag=True, help="reference notebooks' overlapping concatenation (parity mode; per-file path)")
def main(
    wavs,
    list_path,
    checkpoint,
    checkpoint_dir,
    config_path,
    output_dir,
    fmt,
    voicing_threshold_hz,
    octave_correct,
    legacy_concat,
):
    paths = _gather_inputs(wavs, list_path)
    if not paths:
        raise SystemExit("No inputs: pass wav paths and/or --list")

    from pitchextractor_tpu import config as config_lib
    from pitchextractor_tpu.infer import F0Predictor, latest_checkpoint, load_model
    from pitchextractor_tpu.io import read_audio
    from pitchextractor_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    config = {}
    if os.path.isfile(config_path):
        config = config_lib.resolve(config_lib.load_config(config_path))

    if checkpoint is None:
        checkpoint = latest_checkpoint(checkpoint_dir)
        if checkpoint is None:
            raise SystemExit(f"No checkpoint found under {checkpoint_dir}")
    model, variables = load_model(checkpoint, config)
    mel_params = (config.get("dataset_params", {}) or {}).get("mel_params")
    predictor = F0Predictor(
        model,
        variables,
        mel_params=mel_params,
        voicing_threshold_hz=voicing_threshold_hz,
        octave_correction=octave_correct,
    )

    audios, srs = [], []
    for p in paths:
        audio, sr = read_audio(p)
        audios.append(np.asarray(audio, np.float32).reshape(-1))
        srs.append(sr)

    if legacy_concat:
        contours = []
        for audio, sr in zip(audios, srs):
            contours.append(predictor.predict_f0(audio, sr, legacy_concat=True))
    else:
        # one batched dispatch per (sample-rate, length-bucket) group
        contours = [None] * len(paths)
        by_sr = {}
        for i, sr in enumerate(srs):
            by_sr.setdefault(sr, []).append(i)
        for sr, idxs in sorted(by_sr.items()):
            outs = predictor.predict_f0_batch([audios[i] for i in idxs], sr)
            for i, out in zip(idxs, outs):
                contours[i] = out

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    frame_s = predictor.frame_period_ms / 1000.0
    written = []
    for p, f0 in zip(paths, contours):
        stem = os.path.splitext(os.path.basename(p) if output_dir else p)[0]
        base = os.path.join(output_dir, stem) if output_dir else stem
        if fmt == "npy":
            out_path = base + "_f0.npy"
            np.save(out_path, np.asarray(f0, np.float32))
        else:
            out_path = base + "_f0.csv"
            with open(out_path, "w") as fh:
                fh.write("time_s,f0_hz,voiced\n")
                for k, hz in enumerate(np.asarray(f0, np.float32)):
                    fh.write(f"{k * frame_s:.6f},{hz:.3f},{int(hz > voicing_threshold_hz)}\n")
        written.append(out_path)

    print(
        json.dumps(
            {
                "checkpoint": checkpoint,
                "inputs": len(paths),
                "frames": [int(np.asarray(c).shape[0]) for c in contours],
                "outputs": written,
            }
        )
    )


if __name__ == "__main__":
    main()
