"""DSP numerics tests.

The STFT path is verified against a torch oracle (``torch.stft`` is the exact
kernel inside torchaudio's ``Spectrogram``, the reference front-end at
meldataset.py:77).  torch here is a *test oracle only* — the compute path under
test is numpy/JAX.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pitchextractor_tpu.dsp import (
    MelSpectrogram,
    frame_count,
    log_normalize_np,
    mel_filterbank,
    mel_spectrogram_jax,
    mel_spectrogram_np,
    resample_jax,
    resample_np,
    stft_jax,
    stft_np,
)

torch = pytest.importorskip("torch")


def _signal(n=24000, sr=24000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = 0.4 * np.sin(2 * np.pi * 220.0 * t) + 0.1 * rng.standard_normal(n)
    return x.astype(np.float32)


def _torch_spectrogram(x, n_fft=1024, hop=300, win=1024, power=2.0):
    xt = torch.from_numpy(x.astype(np.float64))
    window = torch.hann_window(win, periodic=True, dtype=torch.float64)
    spec = torch.stft(
        xt,
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=window,
        center=True,
        pad_mode="reflect",
        onesided=True,
        return_complex=True,
        normalized=False,
    )
    return (spec.abs() ** power).numpy()


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 300, 1024), (1024, 256, 512), (512, 128, 512)])
def test_stft_np_matches_torch(n_fft, hop, win):
    x = _signal()
    ours = np.abs(stft_np(x, n_fft=n_fft, hop_length=hop, win_length=win)) ** 2
    ref = _torch_spectrogram(x, n_fft=n_fft, hop=hop, win=win)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-8)


def test_stft_jax_matches_np():
    x = _signal()
    ours_np = np.abs(stft_np(x, n_fft=1024, hop_length=300, win_length=1024)) ** 2
    ours_jax = np.abs(np.asarray(stft_jax(jnp.asarray(x), 1024, 300, 1024))) ** 2
    assert ours_jax.shape == ours_np.shape
    scale = np.maximum(ours_np, 1e-3)
    np.testing.assert_allclose(ours_jax / scale, ours_np / scale, atol=2e-4)


def test_stft_jax_batched():
    x = np.stack([_signal(seed=0), _signal(seed=1)])
    batched = np.asarray(stft_jax(jnp.asarray(x), 1024, 300, 1024))
    single0 = np.asarray(stft_jax(jnp.asarray(x[0]), 1024, 300, 1024))
    np.testing.assert_allclose(np.abs(batched[0]), np.abs(single0), rtol=1e-5, atol=1e-5)


def test_frame_count():
    x = _signal(n=24000)
    spec = stft_np(x, n_fft=1024, hop_length=300, win_length=1024)
    assert spec.shape[1] == frame_count(24000, 300) == 1 + 24000 // 300


def test_mel_filterbank_properties():
    fb = mel_filterbank(24000, 1024, 80)
    assert fb.shape == (513, 80)
    assert np.all(fb >= 0)
    # every filter has some support and unit peak-ish triangular shape
    assert np.all(fb.max(axis=0) > 0)
    # filters are band-limited: first bin only touched by filter 0's rise
    assert fb[-1, :-1].sum() == 0 or fb[-1, -1] >= 0


def test_mel_np_vs_jax():
    x = _signal()
    m_np = mel_spectrogram_np(x, 24000, 1024, 1024, 300, 80)
    m_jax = np.asarray(mel_spectrogram_jax(jnp.asarray(x), 24000, 1024, 1024, 300, 80))
    assert m_np.shape == m_jax.shape == (80, frame_count(24000, 300))
    scale = np.maximum(m_np, 1e-4)
    np.testing.assert_allclose(m_jax / scale, m_np / scale, atol=5e-4)


def test_log_norm_matches_reference_formula():
    mel = np.abs(_signal(n=1000)).reshape(40, 25).astype(np.float32)
    normed = log_normalize_np(mel)
    expected = (np.log(1e-5 + mel.astype(np.float64)) + 4.0) / 4.0
    np.testing.assert_allclose(normed, expected.astype(np.float32), rtol=1e-6)


def test_melspectrogram_class():
    frontend = MelSpectrogram(sample_rate=24000, n_fft=1024, hop_length=300, n_mels=80)
    x = _signal()
    host = frontend(x)
    dev = np.asarray(frontend.batch(jnp.asarray(x[None, :])))[0]
    assert host.shape == dev.shape
    assert frontend.params["win_length"] == 1024


@pytest.mark.parametrize("sr_from,sr_to", [(48000, 24000), (16000, 24000), (22050, 24000), (24000, 16000)])
def test_resample_preserves_tone(sr_from, sr_to):
    seconds = 0.5
    freq = 440.0
    t = np.arange(int(sr_from * seconds)) / sr_from
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    y = resample_np(x, sr_from, sr_to)
    assert y.shape[0] == int(np.ceil(sr_to * x.shape[0] / sr_from))
    # the dominant frequency must be preserved
    spectrum = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spectrum) * sr_to / len(y)
    assert abs(peak_hz - freq) < 3.0
    # interior samples match the analytic resampled sine closely
    t2 = np.arange(len(y)) / sr_to
    ref = np.sin(2 * np.pi * freq * t2)
    interior = slice(100, -100)
    assert np.max(np.abs(y[interior] - ref[interior])) < 5e-3


def test_resample_jax_matches_np():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(4800).astype(np.float32)
    y_np = resample_np(x, 48000, 24000)
    y_jax = np.asarray(resample_jax(jnp.asarray(x), 48000, 24000))
    assert y_np.shape == y_jax.shape
    np.testing.assert_allclose(y_jax, y_np, atol=1e-4)


def test_resample_identity():
    x = _signal()
    np.testing.assert_array_equal(resample_np(x, 24000, 24000), x)


def test_mel_gemm_matches_rfft_path():
    from pitchextractor_tpu.dsp import mel_spectrogram_gemm

    x = _signal()
    ref = mel_spectrogram_np(x, 24000, 1024, 1024, 300, 80)
    gemm = np.asarray(mel_spectrogram_gemm(jnp.asarray(x), 24000, 1024, 1024, 300, 80))
    assert gemm.shape == ref.shape
    scale = np.maximum(ref, 1e-4)
    np.testing.assert_allclose(gemm / scale, ref / scale, atol=2e-3)


def test_mel_gemm_batched():
    from pitchextractor_tpu.dsp import mel_spectrogram_gemm

    x = np.stack([_signal(seed=0), _signal(seed=1)])
    out = np.asarray(mel_spectrogram_gemm(jnp.asarray(x), 24000, 1024, 1024, 300, 80))
    single = np.asarray(mel_spectrogram_gemm(jnp.asarray(x[1]), 24000, 1024, 1024, 300, 80))
    np.testing.assert_allclose(out[1], single, rtol=1e-4, atol=1e-4)
