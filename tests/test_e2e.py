"""End-to-end smoke: the ``train.py --config_path`` contract on a tiny
generated corpus — config load, cache warm-up, training epochs, checkpoint
save, resume, and inference from the trained checkpoint."""

import json
import os

import numpy as np
import pytest
import yaml

from pitchextractor_tpu.io import write_wav

SR = 24000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        freq = float(rng.uniform(120, 400))
        t = np.arange(int(SR * 0.6)) / SR
        x = 0.4 * np.sin(2 * np.pi * freq * t) + 0.005 * rng.standard_normal(len(t))
        p = str(root / f"utt{i}.wav")
        write_wav(p, x.astype(np.float32), SR)
        paths.append(p)
    train_list = str(root / "train_list.txt")
    val_list = str(root / "val_list.txt")
    with open(train_list, "w") as fh:
        fh.writelines(p + "|x\n" for p in paths[:4])
    with open(val_list, "w") as fh:
        fh.writelines(p + "|x\n" for p in paths[4:])
    return root, train_list, val_list


def _write_config(root, train_list, val_list, log_dir):
    config = {
        "log_dir": str(log_dir),
        "save_freq": 2,
        "epochs": 2,
        "batch_size": 2,
        "num_workers": 0,
        "train_data": train_list,
        "val_data": val_list,
        "training": {"mixed_precision": False, "gradient_checkpointing": False},
        "model_params": {
            "num_class": 1,
            "sequence_model": {"model_type": "bilstm", "num_layers": 1, "hidden_size": 16},
        },
        "optimizer_params": {"lr": 1e-3},
        "loss_params": {"lambda_f0": 0.1},
        "dataset_params": {
            "mel_params": {"sample_rate": SR, "n_fft": 1024, "win_len": 1024, "n_mels": 80, "hop_length": 300},
            "f0_params": {"bad_f0_threshold": 5},
            "synthetic_data": {"enabled": False},
            "verbose": False,
        },
    }
    config_path = str(root / "config.yml")
    with open(config_path, "w") as fh:
        yaml.safe_dump(config, fh)
    return config_path


def test_train_cli_end_to_end(corpus, tmp_path):
    root, train_list, val_list = corpus
    log_dir = tmp_path / "run"
    config_path = _write_config(root, train_list, val_list, log_dir)

    from pitchextractor_tpu.cli import run

    assert run(config_path) == 0

    # config archived, log written, checkpoint saved
    assert os.path.isfile(log_dir / "config.yml")
    assert os.path.isfile(log_dir / "train.log")
    ckpt = log_dir / "epoch_00002.ckpt"
    assert ckpt.is_file()
    meta = json.load(open(str(ckpt) + ".json"))
    assert meta["epochs"] == 2

    # F0/mel caches were produced next to the audio
    cache_files = [p for p in os.listdir(root) if "_f0" in p or "_mel" in p]
    assert cache_files

    # inference from the trained checkpoint
    from pitchextractor_tpu.infer import F0Predictor, latest_checkpoint, load_model

    found = latest_checkpoint(str(log_dir))
    assert found == str(ckpt)
    model, variables = load_model(found)
    predictor = F0Predictor(model, variables)
    t = np.arange(SR) / SR
    audio = 0.4 * np.sin(2 * np.pi * 220 * t).astype(np.float32)
    f0 = predictor.predict_f0(audio)
    assert f0.shape == (1 + SR // 300,)
    assert np.all(np.isfinite(f0))

    # resume path: pretrained_model from the checkpoint
    cfg = yaml.safe_load(open(config_path))
    cfg["pretrained_model"] = str(ckpt)
    cfg["load_only_params"] = False
    cfg["epochs"] = 1
    cfg["log_dir"] = str(tmp_path / "run2")
    resume_path = str(root / "resume.yml")
    yaml.safe_dump(cfg, open(resume_path, "w"))
    assert run(resume_path) == 0

    # restart-on-RSS: when the process exceeds training.max_rss_gb the run
    # checkpoints the current epoch and exits with the supervisor code; a
    # relaunch auto-resumes past it
    import pitchextractor_tpu.cli as cli_mod

    rss_dir = tmp_path / "run_rss"
    rss_cfg = yaml.safe_load(open(config_path))
    rss_cfg["log_dir"] = str(rss_dir)
    rss_cfg["epochs"] = 2
    rss_cfg["save_freq"] = 5  # no periodic save before the guard fires
    rss_path = str(root / "rss.yml")
    yaml.safe_dump(rss_cfg, open(rss_path, "w"))
    real_rss = cli_mod._rss_gb
    cli_mod._rss_gb = lambda: 10_000.0
    try:
        assert run(rss_path) == cli_mod.RSS_EXIT_CODE
    finally:
        cli_mod._rss_gb = real_rss
    assert (rss_dir / "epoch_00001.ckpt").is_file()  # guard checkpointed epoch 1
    assert run(rss_path) == 0  # relaunch resumes and finishes epoch 2

    # auto-resume: re-running the SAME config with a raised epoch budget picks
    # up the newest epoch_*.ckpt in log_dir and continues (no pretrained_model)
    cfg = yaml.safe_load(open(config_path))
    cfg["epochs"] = 3
    yaml.safe_dump(cfg, open(config_path, "w"))
    assert run(config_path) == 0
    assert (log_dir / "epoch_00002.ckpt").is_file()  # untouched
    log_text = open(log_dir / "train.log").read()
    assert "auto-resuming" in log_text
    meta3 = json.load(open(str(log_dir / "epoch_00002.ckpt") + ".json"))
    assert meta3["epochs"] == 2  # old checkpoint not overwritten by epoch 3


@pytest.mark.slow
def test_train_cli_freq_pack_end_to_end(corpus, tmp_path):
    """model_params.freq_pack (the lane-native packed trunk,
    models/freq_pack.py) through the full shell contract: train 2 epochs,
    checkpoint is mode-independent, inference from the saved checkpoint
    rebuilds the packed model and yields a finite contour."""
    root, train_list, val_list = corpus
    log_dir = tmp_path / "run_fp"
    config_path = _write_config(root, train_list, val_list, log_dir)
    cfg = yaml.safe_load(open(config_path))
    cfg["model_params"]["freq_pack"] = True
    with open(config_path, "w") as fh:
        yaml.safe_dump(cfg, fh)

    from pitchextractor_tpu.cli import run

    assert run(config_path) == 0
    from pitchextractor_tpu.infer import F0Predictor, latest_checkpoint, load_model
    from pitchextractor_tpu.io import read_audio

    found = latest_checkpoint(str(log_dir))
    assert found
    meta = json.load(open(found + ".json"))
    assert meta["model_params"]["freq_pack"] is True
    model, variables = load_model(found)
    assert model.freq_pack is True
    predictor = F0Predictor(model, variables)
    audio, sr = read_audio(open(train_list).readline().split("|")[0])
    f0 = predictor.predict_f0(audio, sr)
    assert f0.shape[0] == 1 + len(audio) // 300
    assert np.isfinite(f0).all()
