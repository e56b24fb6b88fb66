"""Short-time Fourier transform, numerically matching ``torch.stft`` as used
by torchaudio's ``Spectrogram`` (the reference front-end, meldataset.py:77):
periodic Hann window (zero-padded to ``n_fft`` when shorter), ``center=True``
reflect padding of ``n_fft // 2`` samples, one-sided spectrum, no
normalisation.

Two implementations share one numerics contract:
- ``stft_np``: float32/float64 host path used when writing disk caches that
  must be byte-stable across runs.
- ``stft_jax``: batched, jit-friendly device path.  Framing is expressed as
  ``lax.conv_general_dilated_patches`` so XLA lowers it to an efficient
  windowed gather, and the FFT runs as a real-to-complex transform that XLA
  maps onto the TPU.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def hann_window_np(win_length: int, dtype=np.float64) -> np.ndarray:
    """Periodic Hann window: ``torch.hann_window(win_length, periodic=True)``."""
    n = np.arange(win_length, dtype=dtype)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def _padded_window_np(n_fft: int, win_length: int, dtype=np.float64) -> np.ndarray:
    window = hann_window_np(win_length, dtype=dtype)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        padded = np.zeros(n_fft, dtype=dtype)
        padded[left : left + win_length] = window
        return padded
    return window


def frame_count(num_samples: int, hop_length: int) -> int:
    """Number of STFT frames for a centred transform: ``1 + n // hop``."""
    return 1 + num_samples // hop_length


def stft_np(
    x: np.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
) -> np.ndarray:
    """One-sided complex STFT of a 1-D signal -> (n_fft//2+1, frames)."""
    x = np.asarray(x, dtype=np.float64)
    window = _padded_window_np(n_fft, win_length)
    if center:
        pad = n_fft // 2
        x = np.pad(x, (pad, pad), mode="reflect")
    if x.shape[0] < n_fft:
        x = np.pad(x, (0, n_fft - x.shape[0]))
    n_frames = 1 + (x.shape[0] - n_fft) // hop_length
    strides = (x.strides[0] * hop_length, x.strides[0])
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(n_frames, n_fft), strides=strides, writeable=False
    )
    spec = np.fft.rfft(frames * window, axis=-1)
    return spec.T  # (freq, frames)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "center"))
def stft_jax(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
) -> jnp.ndarray:
    """Batched one-sided complex STFT: (..., samples) -> (..., freq, frames)."""
    x = jnp.asarray(x)
    batch_shape = x.shape[:-1]
    x = x.reshape((-1, x.shape[-1])).astype(jnp.float32)

    window = jnp.asarray(_padded_window_np(n_fft, win_length, dtype=np.float32))
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    if x.shape[-1] < n_fft:
        x = jnp.pad(x, ((0, 0), (0, n_fft - x.shape[-1])))

    # (B, samples) -> (B, n_fft, frames): every column is one analysis frame.
    patches = lax.conv_general_dilated_patches(
        x[:, None, :],
        filter_shape=(n_fft,),
        window_strides=(hop_length,),
        padding="VALID",
    )
    frames = patches * window[None, :, None]
    spec = jnp.fft.rfft(frames, axis=1)  # (B, n_fft//2+1, frames)
    return spec.reshape(batch_shape + spec.shape[1:])
