"""Mel-spectrogram front-end.

Numerics contract: ``torchaudio.transforms.MelSpectrogram`` with the reference
defaults (meldataset.py:34-40,77): power=2.0 spectrogram, HTK mel scale
(``2595·log10(1+f/700)``), ``f_min=0``, ``f_max=sr/2``, **no** filterbank
normalisation, triangular filters over ``linspace(0, sr//2, n_fft//2+1)``
frequencies.  The log-normalisation applied downstream is
``(log(1e-5 + mel) - (-4)) / 4`` (meldataset.py:111,650).

The host numpy path produces the arrays written to the ``_mel.npy`` disk cache
(byte-compatible with the reference cache contract).  The JAX path is batched
and jit-compiled; the spectrogram -> filterbank contraction is a single large
matmul that XLA tiles onto the MXU, and the elementwise log-norm fuses into
its epilogue.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .stft import stft_np, stft_jax, hann_window_np

MEL_LOG_OFFSET = 1e-5
MEL_MEAN = -4.0
MEL_STD = 4.0


def hann_window(win_length: int) -> np.ndarray:
    return hann_window_np(win_length, dtype=np.float32)


def _hz_to_mel_htk(freq):
    return 2595.0 * np.log10(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=16)
def _mel_filterbank_cached(sample_rate, n_fft, n_mels, f_min, f_max, norm, dtype_name):
    fb = _mel_filterbank_build(
        sample_rate, n_fft, n_mels, f_min, f_max, norm, np.dtype(dtype_name)
    )
    fb.flags.writeable = False  # shared across callers
    return fb


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    norm: Optional[str] = None,
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_freqs, n_mels) — memoized (the
    build costs ~1.7 ms and the host data path calls it per item).

    Matches torchaudio ``melscale_fbanks`` with ``mel_scale='htk'``: FFT bin
    frequencies are ``linspace(0, sample_rate // 2, n_fft // 2 + 1)`` and the
    mel band edges are uniformly spaced in HTK mels.
    """
    return _mel_filterbank_cached(
        int(sample_rate), int(n_fft), int(n_mels), float(f_min),
        None if f_max is None else float(f_max), norm, np.dtype(dtype).name,
    )


def _mel_filterbank_build(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    norm: Optional[str] = None,
    dtype=np.float32,
) -> np.ndarray:
    if f_max is None:
        f_max = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)

    m_min = _hz_to_mel_htk(f_min)
    m_max = _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)

    # (n_freqs, n_mels + 2)
    slopes = f_pts[None, :] - all_freqs[:, None]
    f_diff = f_pts[1:] - f_pts[:-1]
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(dtype)


def mel_spectrogram_np(
    waveform: np.ndarray,
    sample_rate: int,
    n_fft: int,
    win_length: int,
    hop_length: int,
    n_mels: int,
    power: float = 2.0,
) -> np.ndarray:
    """Host mel spectrogram: 1-D waveform -> (n_mels, frames) float32."""
    spec = stft_np(waveform, n_fft=n_fft, hop_length=hop_length, win_length=win_length)
    magnitude = np.abs(spec) ** power  # (n_freqs, frames)
    fb = mel_filterbank(sample_rate, n_fft, n_mels, dtype=np.float64)
    mel = fb.T @ magnitude
    return mel.astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "win_length", "hop_length", "n_mels", "power"),
)
def mel_spectrogram_jax(
    waveform: jnp.ndarray,
    sample_rate: int,
    n_fft: int,
    win_length: int,
    hop_length: int,
    n_mels: int,
    power: float = 2.0,
) -> jnp.ndarray:
    """Batched device mel spectrogram: (..., samples) -> (..., n_mels, frames)."""
    spec = stft_jax(waveform, n_fft=n_fft, hop_length=hop_length, win_length=win_length)
    magnitude = jnp.abs(spec) ** power  # (..., n_freqs, frames)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, dtype=np.float32))
    return jnp.einsum("fm,...ft->...mt", fb, magnitude)


@functools.lru_cache(maxsize=8)
def _gemm_dft_matrices(n_fft: int, win_length: int):
    """Window-folded real-DFT matrices for the GEMM-native front-end.

    The periodic-Hann analysis window is folded into the DFT bases, so the
    whole spectrogram is ``frames @ [Wcos | Wsin]`` — one MXU matmul
    (GEMM-native NDFT; the MelT recipe for accelerator audio front-ends).
    """
    from .stft import _padded_window_np

    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    angle = -2.0 * np.pi * n * k / n_fft
    window = _padded_window_np(n_fft, win_length)[:, None]
    wcos = (np.cos(angle) * window).astype(np.float32)
    wsin = (np.sin(angle) * window).astype(np.float32)
    return wcos, wsin


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "win_length", "hop_length", "n_mels"),
)
def mel_spectrogram_gemm(
    waveform: jnp.ndarray,
    sample_rate: int,
    n_fft: int,
    win_length: int,
    hop_length: int,
    n_mels: int,
) -> jnp.ndarray:
    """GEMM-native mel front-end: frame gather -> windowed-DFT matmul ->
    power -> mel matmul.  Numerically equivalent to ``mel_spectrogram_jax``
    (power=2.0), but expressed as two large matmuls that tile directly onto
    the MXU instead of an rfft lowering.
    """
    from jax import lax

    x = jnp.asarray(waveform)
    batch_shape = x.shape[:-1]
    x = x.reshape((-1, x.shape[-1])).astype(jnp.float32)

    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    if x.shape[-1] < n_fft:
        x = jnp.pad(x, ((0, 0), (0, n_fft - x.shape[-1])))
    patches = lax.conv_general_dilated_patches(
        x[:, None, :], filter_shape=(n_fft,), window_strides=(hop_length,), padding="VALID"
    )  # (B, n_fft, frames)
    frames = jnp.swapaxes(patches, 1, 2)  # (B, frames, n_fft)

    wcos_np, wsin_np = _gemm_dft_matrices(n_fft, win_length)
    wcos = jnp.asarray(wcos_np)
    wsin = jnp.asarray(wsin_np)
    re = frames @ wcos  # (B, frames, n_freqs)
    im = frames @ wsin
    power = re * re + im * im

    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, dtype=np.float32))
    mel = power @ fb  # (B, frames, n_mels)
    mel = jnp.swapaxes(mel, 1, 2)  # (B, n_mels, frames)
    return mel.reshape(batch_shape + mel.shape[1:])


def log_normalize(mel: jnp.ndarray, mean: float = MEL_MEAN, std: float = MEL_STD) -> jnp.ndarray:
    """``(log(1e-5 + mel) - mean) / std`` (reference meldataset.py:650)."""
    return (jnp.log(MEL_LOG_OFFSET + mel) - mean) / std


def log_normalize_np(mel: np.ndarray, mean: float = MEL_MEAN, std: float = MEL_STD) -> np.ndarray:
    return ((np.log(MEL_LOG_OFFSET + mel.astype(np.float64)) - mean) / std).astype(np.float32)


class MelSpectrogram:
    """Callable front-end bound to one parameter set.

    Drop-in role of ``torchaudio.transforms.MelSpectrogram`` in the data
    pipeline (reference meldataset.py:77).  ``__call__`` runs the host numpy
    path (cache writes); ``batch`` runs the jitted device path.
    """

    def __init__(
        self,
        sample_rate: int = 24000,
        n_fft: int = 1024,
        win_length: Optional[int] = None,
        hop_length: int = 300,
        n_mels: int = 80,
        power: float = 2.0,
    ) -> None:
        self.sample_rate = int(sample_rate)
        self.n_fft = int(n_fft)
        self.win_length = int(win_length or n_fft)
        self.hop_length = int(hop_length)
        self.n_mels = int(n_mels)
        self.power = float(power)

    @property
    def params(self) -> dict:
        return {
            "sample_rate": self.sample_rate,
            "n_mels": self.n_mels,
            "n_fft": self.n_fft,
            "win_length": self.win_length,
            "hop_length": self.hop_length,
        }

    def __call__(self, waveform: np.ndarray) -> np.ndarray:
        return mel_spectrogram_np(
            np.asarray(waveform),
            sample_rate=self.sample_rate,
            n_fft=self.n_fft,
            win_length=self.win_length,
            hop_length=self.hop_length,
            n_mels=self.n_mels,
            power=self.power,
        )

    def batch(self, waveforms: jnp.ndarray) -> jnp.ndarray:
        return mel_spectrogram_jax(
            waveforms,
            sample_rate=self.sample_rate,
            n_fft=self.n_fft,
            win_length=self.win_length,
            hop_length=self.hop_length,
            n_mels=self.n_mels,
            power=self.power,
        )
