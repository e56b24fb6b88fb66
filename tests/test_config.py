"""Config system tests: defaults, win_len aliasing, list parsing, archive."""

import numpy as np
import pytest
import yaml

from pitchextractor_tpu import config as config_lib


def test_resolve_defaults():
    cfg = config_lib.resolve({})
    assert cfg["batch_size"] == 32
    assert cfg["model_params"]["num_class"] == 1
    assert cfg["loss_params"]["lambda_f0"] == 0.1
    assert cfg["dataset_params"]["mel_params"]["hop_length"] == 300
    assert cfg["training"]["mixed_precision"] is True


def test_win_len_alias():
    params = config_lib.normalize_mel_params({"win_len": 512, "n_fft": 1024})
    assert params["win_length"] == 512
    assert "win_len" not in params


def test_invalid_mel_params():
    with pytest.raises(ValueError):
        config_lib.normalize_mel_params({"hop_length": 0})
    with pytest.raises(ValueError):
        config_lib.normalize_mel_params({"win_length": 2048, "n_fft": 1024})


def test_reference_config_resolves():
    """The reference repo's shipped YAML must resolve unchanged."""
    raw = yaml.safe_load(open("/root/reference/Configs/config.yml"))
    cfg = config_lib.resolve(raw)
    assert cfg["dataset_params"]["mel_params"]["win_length"] == 1024
    assert cfg["batch_size"] == 64
    f0 = cfg["dataset_params"]["f0_params"]
    assert "backend_order" in f0 and "backends" in f0


def test_parse_data_list():
    lines = ["a.wav|label\n", "b.wav|x|y\r\n", "\n", "c.wav\n"]
    assert config_lib.parse_data_list(lines) == ["a.wav", "b.wav", "c.wav"]


def test_archive_config(tmp_path):
    src = tmp_path / "c.yml"
    src.write_text("log_dir: x\n")
    dest = config_lib.archive_config(str(src), str(tmp_path / "logs"))
    assert open(dest).read() == "log_dir: x\n"


def test_get_data_path_list(tmp_path):
    t = tmp_path / "t.txt"
    v = tmp_path / "v.txt"
    t.write_text("a.wav|1\n")
    v.write_text("b.wav|2\n")
    train, val = config_lib.get_data_path_list(str(t), str(v))
    assert train == ["a.wav|1\n"] and val == ["b.wav|2\n"]
