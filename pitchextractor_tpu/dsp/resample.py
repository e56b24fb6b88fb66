"""Sample-rate conversion.

Numerics contract: ``torchaudio.functional.resample`` with its defaults
(``sinc_interp_hann``, ``lowpass_filter_width=6``, ``rolloff=0.99``), which is
what the reference uses for all waveform resampling (meldataset.py:621-627,
Utils/f0_notebook_utils.py:70-75).  The algorithm is polyphase windowed-sinc:
reduce the ratio by the gcd, build one kernel per output phase, and apply it
as a strided convolution.

``resample_np`` is the host path; ``resample_jax`` expresses the same kernel
as ``lax.conv_general_dilated`` so batched resampling runs on the TPU.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=64)
def _sinc_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> Tuple[np.ndarray, int]:
    """Polyphase kernel (new_freq, width*2 + orig_freq) and its half-width."""
    assert orig_freq > 0 and new_freq > 0
    base_freq = min(orig_freq, new_freq) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig_freq / base_freq))

    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = (-np.arange(new_freq, dtype=np.float64)[:, None] / new_freq + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t_pi = t * np.pi
    kernel = np.where(t_pi == 0, 1.0, np.sin(t_pi) / np.where(t_pi == 0, 1.0, t_pi))
    kernel = kernel * window * (base_freq / orig_freq)
    return kernel.astype(np.float64), width


def _reduced(orig_freq: int, new_freq: int) -> Tuple[int, int]:
    g = math.gcd(int(orig_freq), int(new_freq))
    return int(orig_freq) // g, int(new_freq) // g


def resample_np(waveform: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Resample a 1-D float waveform on the host."""
    if orig_freq == new_freq:
        return np.asarray(waveform, dtype=np.float32)
    orig, new = _reduced(orig_freq, new_freq)
    kernel, width = _sinc_kernel(orig, new)

    x = np.asarray(waveform, dtype=np.float64)
    length = x.shape[0]
    target_length = int(math.ceil(new * length / orig))

    padded = np.pad(x, (width, width + orig))
    num_windows = (padded.shape[0] - kernel.shape[1]) // orig + 1
    strides = (padded.strides[0] * orig, padded.strides[0])
    windows = np.lib.stride_tricks.as_strided(
        padded, shape=(num_windows, kernel.shape[1]), strides=strides, writeable=False
    )
    # (num_windows, taps) @ (taps, new) -> (num_windows, new) -> interleave
    out = windows @ kernel.T
    out = out.reshape(-1)[:target_length]
    return out.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("orig_freq", "new_freq"))
def resample_jax(waveform: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Batched device resampling: (..., samples) -> (..., new samples)."""
    if orig_freq == new_freq:
        return jnp.asarray(waveform, dtype=jnp.float32)
    orig, new = _reduced(orig_freq, new_freq)
    kernel_np, width = _sinc_kernel(orig, new)
    kernel = jnp.asarray(kernel_np, dtype=jnp.float32)  # (new, taps)

    x = jnp.asarray(waveform, dtype=jnp.float32)
    batch_shape = x.shape[:-1]
    length = x.shape[-1]
    x = x.reshape((-1, 1, length))
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig)))

    # Convolution with stride=orig; each of the ``new`` kernel rows is an
    # output channel holding one polyphase branch.
    out = lax.conv_general_dilated(
        x,
        kernel[:, None, :],  # (out_ch=new, in_ch=1, taps)
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, new, num_windows)
    out = jnp.swapaxes(out, 1, 2).reshape((out.shape[0], -1))
    target_length = int(math.ceil(new * length / orig))
    out = out[:, :target_length]
    return out.reshape(batch_shape + (target_length,))
