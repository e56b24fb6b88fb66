"""Config system.

Mirrors the reference's plain-YAML config contract (Configs/config.yml in the
reference tree; loaded via ``yaml.safe_load`` at train.py:48 and consumed with
``dict.get(key, default)`` everywhere).  We keep the exact same keys so a user
of the reference can bring their config file unchanged, and add a light
validation/normalisation layer the reference lacks (SURVEY.md §2.2: "No
schema/validation layer").
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml

# Defaults mirroring reference meldataset.py:34-40 (DEFAULT_MEL_PARAMS).
DEFAULT_MEL_PARAMS: Dict[str, Any] = {
    "sample_rate": 24000,
    "n_mels": 80,
    "n_fft": 1024,
    "win_length": 1024,
    "hop_length": 300,
}

# Top-level defaults mirroring reference train.py:61-67.
DEFAULT_TOP_LEVEL: Dict[str, Any] = {
    "log_dir": "Checkpoint",
    "save_freq": 10,
    "device": "tpu",
    "epochs": 100,
    "batch_size": 32,
    "pretrained_model": "",
    "train_data": "Data/train_list.txt",
    "val_data": "Data/val_list.txt",
    "num_workers": 8,
}


def load_config(path: str) -> Dict[str, Any]:
    """Load a YAML config file (reference train.py:48)."""
    with open(path, "r", encoding="utf-8") as handle:
        config = yaml.safe_load(handle) or {}
    if not isinstance(config, dict):
        raise ValueError(f"Config root must be a mapping, got {type(config)!r}")
    return config


def normalize_mel_params(mel_params: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    """Merge user mel params over the defaults.

    Handles the ``win_len`` -> ``win_length`` alias exactly as the reference
    does (meldataset.py:59-60).
    """
    params = dict(mel_params or {})
    if "win_len" in params and "win_length" not in params:
        params["win_length"] = params.pop("win_len")
    params.pop("win_len", None)
    merged = dict(DEFAULT_MEL_PARAMS)
    merged.update(params)
    merged = {k: merged[k] for k in merged}
    # Integer coercion for the structural params.
    for key in ("sample_rate", "n_mels", "n_fft", "win_length", "hop_length"):
        merged[key] = int(merged[key])
    if merged["hop_length"] <= 0:
        raise ValueError("hop_length must be positive")
    if merged["win_length"] > merged["n_fft"]:
        raise ValueError("win_length cannot exceed n_fft")
    return merged


def resolve(config: Dict[str, Any]) -> Dict[str, Any]:
    """Return a fully-populated config dict with all defaults applied.

    The returned dict is a deep copy; mutating it does not affect the input.
    """
    cfg = copy.deepcopy(config)
    for key, value in DEFAULT_TOP_LEVEL.items():
        cfg.setdefault(key, value)
    cfg.setdefault("training", {})
    cfg["training"].setdefault("mixed_precision", True)
    cfg["training"].setdefault("gradient_checkpointing", False)
    cfg.setdefault("model_params", {})
    cfg["model_params"].setdefault("num_class", 1)
    cfg["model_params"].setdefault("sequence_model", {})
    cfg.setdefault("optimizer_params", {})
    cfg["optimizer_params"].setdefault("lr", 3e-4)
    cfg.setdefault("loss_params", {})
    cfg["loss_params"].setdefault("lambda_f0", 0.1)
    dataset_params = cfg.setdefault("dataset_params", {})
    dataset_params["mel_params"] = normalize_mel_params(dataset_params.get("mel_params"))
    dataset_params.setdefault("f0_params", {})
    dataset_params.setdefault("synthetic_data", {})
    dataset_params.setdefault("dataloader", {})
    return cfg


def archive_config(config_path: str, log_dir: str) -> str:
    """Copy the config into the log dir for provenance (train.py:51)."""
    os.makedirs(log_dir, exist_ok=True)
    destination = os.path.join(log_dir, os.path.basename(config_path))
    if os.path.abspath(config_path) != os.path.abspath(destination):
        with open(config_path, "rb") as src, open(destination, "wb") as dst:
            dst.write(src.read())
    return destination


def get_data_path_list(train_path: Optional[str], val_path: Optional[str]):
    """Read train/val lists; lines are ``filename.wav|anything`` (train.py:30-43)."""
    train_path = train_path or "Data/train_list.txt"
    val_path = val_path or "Data/val_list.txt"
    with open(train_path, "r", encoding="utf-8") as handle:
        train_list = handle.readlines()
    with open(val_path, "r", encoding="utf-8") as handle:
        val_list = handle.readlines()
    return train_list, val_list


def parse_data_list(lines) -> list:
    """Parse ``path|label`` lines into paths (meldataset.py:55-56).

    The reference strips the final character of each line (``l[:-1]``) which
    assumes a trailing newline; we strip newlines robustly instead while
    keeping the ``|`` split contract.
    """
    paths = []
    for line in lines:
        line = line.rstrip("\r\n")
        if not line:
            continue
        paths.append(line.split("|")[0])
    return paths
