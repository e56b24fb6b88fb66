#!/usr/bin/env python
"""Convert pretrained CREPE weights (torchcrepe .pth or crepe keras .h5) into
the npz layout consumed by pitchextractor_tpu/labels/crepe.py.

Gated on the source packages being installed — in hermetic environments use
tools/train_crepe.py to bootstrap weights from synthetic data instead.

Usage:
  python tools/convert_crepe_weights.py --source torchcrepe --model full \
      --output weights/crepe_full.npz
  python tools/convert_crepe_weights.py --source file --input crepe.pth \
      --output weights/crepe_full.npz
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np


def convert_torch_state(state: dict) -> dict:
    """torchcrepe Crepe module state_dict -> our npz array dict.

    torchcrepe layout: conv{i}.weight (C_out, C_in, W, 1), conv{i}.bias,
    conv{i}_BN.{weight,bias,running_mean,running_var}, classifier.{weight,bias}.
    Ours: conv kernels (W, C_in, C_out) for flax nn.Conv over 1-D.
    """
    arrays = {}
    for i in range(1, 7):
        w = np.asarray(state[f"conv{i}.weight"])  # (out, in, W, 1)
        arrays[f"conv{i}.kernel"] = np.transpose(w[..., 0], (2, 1, 0))  # (W, in, out)
        arrays[f"conv{i}.bias"] = np.asarray(state[f"conv{i}.bias"])
        arrays[f"bn{i}.scale"] = np.asarray(state[f"conv{i}_BN.weight"])
        arrays[f"bn{i}.bias"] = np.asarray(state[f"conv{i}_BN.bias"])
        arrays[f"bn{i}.mean"] = np.asarray(state[f"conv{i}_BN.running_mean"])
        arrays[f"bn{i}.var"] = np.asarray(state[f"conv{i}_BN.running_var"])
    arrays["classifier.kernel"] = np.transpose(np.asarray(state["classifier.weight"]), (1, 0))
    arrays["classifier.bias"] = np.asarray(state["classifier.bias"])
    return arrays


@click.command()
@click.option("--source", type=click.Choice(["torchcrepe", "file"]), default="torchcrepe")
@click.option("--model", "model_name", default="full", type=str)
@click.option("--input", "input_path", default=None, type=str)
@click.option("--output", required=True, type=str)
def main(source, model_name, input_path, output):
    try:
        import torch
    except ImportError:
        raise SystemExit("torch is required for CREPE weight conversion")

    if source == "torchcrepe":
        try:
            import torchcrepe
        except ImportError:
            raise SystemExit(
                "torchcrepe is not installed; use --source file with a .pth, "
                "or bootstrap weights with tools/train_crepe.py"
            )
        torchcrepe.load.model("cpu", model_name)
        state = torchcrepe.infer.model.state_dict()
    else:
        if not input_path:
            raise SystemExit("--input is required with --source file")
        state = torch.load(input_path, map_location="cpu")
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]

    arrays = convert_torch_state({k: v.numpy() for k, v in state.items()})
    os.makedirs(os.path.dirname(os.path.abspath(output)), exist_ok=True)
    np.savez(output, **arrays)
    print(f"wrote {output} ({len(arrays)} arrays)")


if __name__ == "__main__":
    main()
