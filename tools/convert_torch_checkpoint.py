#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (``epoch_%05d.pth``, saved by
reference trainer.py:138-153) into this framework's msgpack format, mapping
the reference JDCNet parameter names/layouts (model.py) onto the flax tree
(pitchextractor_tpu/models/jdc.py).

Supports the conv stack and both sequence heads (BiLSTM and Transformer).
Usage: python tools/convert_torch_checkpoint.py in.pth out.ckpt [--num-layers 4]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _conv(w):
    # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense(w):
    # torch (out, in) -> flax (in, out)
    return np.transpose(np.asarray(w), (1, 0))


def convert_state_dict(state: dict) -> tuple[dict, dict, int, dict]:
    """-> (params, batch_stats, num_class, info)"""
    t = {k: np.asarray(v) for k, v in state.items()}

    params: dict = {}
    stats: dict = {}

    def bn(dst_params: dict, dst_stats: dict, prefix: str):
        dst_params["scale"] = t[f"{prefix}.weight"]
        dst_params["bias"] = t[f"{prefix}.bias"]
        dst_stats["mean"] = t[f"{prefix}.running_mean"]
        dst_stats["var"] = t[f"{prefix}.running_var"]

    # conv_block: Conv, BN, LReLU, Conv (reference model.py:23-28)
    cb_p, cb_s = {}, {}
    cb_p["conv1"] = {"kernel": _conv(t["conv_block.0.weight"])}
    cb_p["bn"], cb_s["bn"] = {}, {}
    bn(cb_p["bn"], cb_s["bn"], "conv_block.1")
    cb_p["conv2"] = {"kernel": _conv(t["conv_block.3.weight"])}
    params["conv_block"], stats["conv_block"] = cb_p, cb_s

    # res blocks (reference model.py:143-175)
    for i in (1, 2, 3):
        src = f"res_block{i}"
        rp, rs = {}, {}
        rp["pre_bn"], rs["pre_bn"] = {}, {}
        bn(rp["pre_bn"], rs["pre_bn"], f"{src}.pre_conv.0")
        rp["conv1"] = {"kernel": _conv(t[f"{src}.conv.0.weight"])}
        rp["bn"], rs["bn"] = {}, {}
        bn(rp["bn"], rs["bn"], f"{src}.conv.1")
        rp["conv2"] = {"kernel": _conv(t[f"{src}.conv.3.weight"])}
        if f"{src}.conv1by1.weight" in t:
            rp["conv1by1"] = {"kernel": _conv(t[f"{src}.conv1by1.weight"])}
        params[src], stats[src] = rp, rs

    # pool block BN (model.py:36-41)
    params["pool_bn"], stats["pool_bn"] = {}, {}
    bn(params["pool_bn"], stats["pool_bn"], "pool_block.0")

    # detector conv + BN (model.py:52-57)
    params["detector_conv"] = {"kernel": _conv(t["detector_conv.0.weight"])}
    params["detector_bn"], stats["detector_bn"] = {}, {}
    bn(params["detector_bn"], stats["detector_bn"], "detector_conv.1")

    # sequence heads: nn.LSTM (model.py:218-228) or nn.TransformerEncoder
    # (model.py:229-241)
    lstm_keys = [k for k in t if re.match(r"sequence_(classifier|detector)\.model\.weight_ih_l\d+$", k)]
    tf_keys = [k for k in t if ".model.layers.0.self_attn.in_proj_weight" in k]
    if lstm_keys:
        num_layers = 1 + max(int(re.search(r"_l(\d+)$", k).group(1)) for k in lstm_keys)
        for head in ("sequence_classifier", "sequence_detector"):
            hp = {"bilstm": {}}
            for layer in range(num_layers):
                for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
                    base = f"{head}.model"
                    try:
                        w_ih = t[f"{base}.weight_ih_l{layer}{suffix}"]
                        w_hh = t[f"{base}.weight_hh_l{layer}{suffix}"]
                        b_ih = t[f"{base}.bias_ih_l{layer}{suffix}"]
                        b_hh = t[f"{base}.bias_hh_l{layer}{suffix}"]
                    except KeyError:
                        continue
                    hp["bilstm"][f"l{layer}_{direction}"] = {
                        "w_ih": _dense(w_ih),  # (4H, D) -> (D, 4H)
                        "w_hh": _dense(w_hh),
                        "b_ih": np.asarray(b_ih),
                        "b_hh": np.asarray(b_hh),
                    }
            params[head] = hp
        num_lstm_layers = num_layers
    elif tf_keys:
        num_lstm_layers = 0
        layer_ids = sorted(
            {
                int(re.search(r"\.model\.layers\.(\d+)\.", k).group(1))
                for k in t
                if ".model.layers." in k
            }
        )
        d_model = t["sequence_classifier.model.layers.0.self_attn.in_proj_weight"].shape[1]
        nhead = 8  # reference default (model.py:207); override via config at load
        hd = d_model // nhead

        def mha(prefix):
            w_in = np.asarray(t[f"{prefix}.self_attn.in_proj_weight"])  # (3D, D)
            b_in = np.asarray(t[f"{prefix}.self_attn.in_proj_bias"])
            w_out = np.asarray(t[f"{prefix}.self_attn.out_proj.weight"])  # (D, D)
            b_out = np.asarray(t[f"{prefix}.self_attn.out_proj.bias"])
            def qkv(i):
                w = w_in[i * d_model : (i + 1) * d_model]  # (D, D)
                b = b_in[i * d_model : (i + 1) * d_model]
                return {
                    "kernel": w.T.reshape(d_model, nhead, hd),
                    "bias": b.reshape(nhead, hd),
                }
            return {
                "query": qkv(0),
                "key": qkv(1),
                "value": qkv(2),
                "out": {
                    "kernel": w_out.T.reshape(nhead, hd, d_model),
                    "bias": b_out,
                },
            }

        def ln(prefix):
            return {"scale": np.asarray(t[f"{prefix}.weight"]), "bias": np.asarray(t[f"{prefix}.bias"])}

        for head in ("sequence_classifier", "sequence_detector"):
            tf = {
                "input_norm": ln(f"{head}.layer_norm"),
            }
            for i in layer_ids:
                prefix = f"{head}.model.layers.{i}"
                tf[f"layer{i}"] = {
                    "self_attn": mha(prefix),
                    "norm1": ln(f"{prefix}.norm1"),
                    "norm2": ln(f"{prefix}.norm2"),
                    "ff1": {"kernel": _dense(t[f"{prefix}.linear1.weight"]), "bias": np.asarray(t[f"{prefix}.linear1.bias"])},
                    "ff2": {"kernel": _dense(t[f"{prefix}.linear2.weight"]), "bias": np.asarray(t[f"{prefix}.linear2.bias"])},
                }
            params[head] = {"transformer": tf}
    else:
        num_lstm_layers = 0
        for head in ("sequence_classifier", "sequence_detector"):
            params[head] = {}

    # output heads (model.py:67-70)
    params["classifier"] = {"kernel": _dense(t["classifier.weight"]), "bias": t["classifier.bias"]}
    params["detector"] = {"kernel": _dense(t["detector.weight"]), "bias": t["detector.bias"]}

    num_class = int(t["classifier.weight"].shape[0])
    hidden = int(t["sequence_classifier.model.weight_hh_l0"].shape[1]) if lstm_keys else 0
    info = {
        "num_layers": num_lstm_layers if lstm_keys else (len(layer_ids) if tf_keys else 0),
        "hidden_size": hidden,
        "model_type": "bilstm" if lstm_keys else ("transformer" if tf_keys else "bilstm"),
    }
    return params, stats, num_class, info


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("input", help="reference .pth checkpoint")
    parser.add_argument("output", help="output .ckpt path")
    args = parser.parse_args()

    try:
        import torch
    except ImportError:
        print("torch is required for .pth conversion", file=sys.stderr)
        return 1

    raw = torch.load(args.input, map_location="cpu", weights_only=False)
    state = raw.get("model", raw.get("state_dict", raw))
    state = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in state.items()}
    params, stats, num_class, info = convert_state_dict(state)

    from pitchextractor_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(
        args.output,
        params,
        stats,
        opt_state={},
        steps=int(raw.get("steps", 0)) if isinstance(raw, dict) else 0,
        epochs=int(raw.get("epochs", 0)) if isinstance(raw, dict) else 0,
        extra_meta={
            "model_params": {
                "num_class": num_class,
                "sequence_model": {
                    "model_type": info["model_type"],
                    "num_layers": info["num_layers"],
                    "hidden_size": info["hidden_size"],
                },
            },
            "converted_from": os.path.basename(args.input),
        },
    )
    print(f"converted {args.input} -> {args.output} (num_class={num_class}, {info})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
