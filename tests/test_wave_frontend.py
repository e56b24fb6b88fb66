"""On-device front-end mode tests: wave-crop dataset items, collation, and
training-step equivalence with the host-mel path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pitchextractor_tpu.data import Collater, MelDataset
from pitchextractor_tpu.io import write_wav
from pitchextractor_tpu.models import JDCNet
from pitchextractor_tpu.train import Trainer, build_optimizer

SR = 24000
TINY_SEQ = {"model_type": "bilstm", "num_layers": 1, "hidden_size": 16}


@pytest.fixture()
def wave_dataset(tmp_path):
    paths = []
    for i, seconds in enumerate((0.8, 3.0)):
        t = np.arange(int(SR * seconds)) / SR
        x = 0.4 * np.sin(2 * np.pi * (200 + 60 * i) * t)
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, x.astype(np.float32), SR)
        paths.append(p)
    return MelDataset([p + "|x\n" for p in paths], verbose=False, return_wave=True)


def test_wave_items_fixed_length(wave_dataset):
    for idx in range(2):
        wave, f0, sil = wave_dataset[idx]
        assert wave.shape == ((192 - 1) * 300,)
        assert f0.shape == sil.shape == (192,)
        np.testing.assert_array_equal(sil == 1.0, f0 == 0.0)


def test_wave_collation(wave_dataset):
    batch = Collater()([wave_dataset[0], wave_dataset[1]])
    waves, f0s, sils = batch
    assert waves.shape == (2, (192 - 1) * 300)
    assert f0s.shape == sils.shape == (2, 192)


def test_wave_labels_align_with_crop(wave_dataset):
    """The f0 crop must describe the waveform crop: voiced frames should be
    where the crop has energy."""
    wave, f0, sil = wave_dataset[0]  # 0.8 s file -> padded to 191 hops
    frames_with_signal = 1 + int(SR * 0.8) // 300
    assert np.count_nonzero(f0[: frames_with_signal - 4]) > 0.8 * (frames_with_signal - 4)
    assert np.all(f0[frames_with_signal + 2 :] == 0)


def test_train_step_wave_vs_host_mel(wave_dataset):
    """Loss computed from a waveform batch must be close to the loss from the
    equivalent host-mel batch (same crop, same params)."""
    from pitchextractor_tpu.dsp.mel import mel_spectrogram_np, MEL_LOG_OFFSET

    wave, f0, sil = wave_dataset[0]
    waves = np.stack([wave, wave])
    f0s = np.stack([f0, f0])
    sils = np.stack([sil, sil])

    # host-mel equivalent of the same crops
    mel = mel_spectrogram_np(wave, SR, 1024, 1024, 300, 80)
    mel = ((np.log(MEL_LOG_OFFSET + mel) + 4.0) / 4.0).astype(np.float32)[:, :192]
    mels = np.stack([mel, mel])[:, None, :, :]

    model = JDCNet(num_class=1, sequence_model_config=TINY_SEQ)
    tx, schedule = build_optimizer(
        {"params": None, "optimizer_params": {}, "scheduler_params": {"max_lr": 1e-3, "epochs": 1, "steps_per_epoch": 2}}
    )

    def make_trainer():
        return Trainer(
            model=model, optimizer=tx, scheduler=schedule,
            loss_config={"lambda_f0": 0.1}, use_mixed_precision=False,
            n_mels=80, max_mel_length=192, seed=7,
        )

    t1 = make_trainer()
    m_wave = t1._eval_step(t1.state.params, t1.state.batch_stats, *t1._put_batch((waves, f0s, sils)))
    t2 = make_trainer()
    m_mel = t2._eval_step(t2.state.params, t2.state.batch_stats, *t2._put_batch((mels, f0s, sils)))
    np.testing.assert_allclose(float(m_wave["loss"]), float(m_mel["loss"]), rtol=2e-2)

    # and a train step runs with finite metrics
    metrics = t1.run((waves, f0s, sils))
    assert all(np.isfinite(v) for v in metrics.values())
