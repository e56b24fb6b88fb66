"""Batched YIN pitch tracker (de Cheveigné & Kawahara 2002) in JAX.

The difference function is computed in the lag domain with FFTs
(d(τ) = r(0) + r_τ(0) - 2·r(τ)), normalized cumulatively (CMND), thresholded,
and refined with parabolic interpolation — all static-shaped and batched so
one jitted program labels a whole batch on the TPU.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


@functools.partial(jax.jit, static_argnames=("sr", "hop_length", "fmin", "fmax", "threshold"))
def yin_batch(
    audio: jnp.ndarray,
    sr: int,
    hop_length: int,
    fmin: float = 40.0,
    fmax: float = 1100.0,
    threshold: float = 0.15,
) -> jnp.ndarray:
    """(B, N) waveforms -> (B, T) Hz contours, zeros on unvoiced frames."""
    audio = jnp.asarray(audio, dtype=jnp.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    B, N = audio.shape

    lag_min = max(1, int(math.floor(sr / fmax)))
    lag_max = int(math.ceil(sr / fmin))
    win = 2 * lag_max  # analysis window: two periods of the lowest pitch
    nfft = _next_pow2(win + lag_max + 1)
    T = 1 + N // hop_length

    pad = win // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad + win)))
    frames = lax.conv_general_dilated_patches(
        padded[:, None, :], filter_shape=(win,), window_strides=(hop_length,), padding="VALID"
    )[:, :, :T]
    frames = jnp.swapaxes(frames, 1, 2)  # (B, T, win)

    # difference function via autocorrelation + cumulative energy terms
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    r = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[..., : lag_max + 1]
    sq = frames * frames
    cum = jnp.cumsum(sq, axis=-1)
    total = cum[..., -1:]
    # energy of x[τ : τ+W-τ] terms: power of the shifted segment
    # d(τ) = Σ_{j} (x_j - x_{j+τ})² over j in [0, W-τ)
    #       = E[0:W-τ] + E[τ:W] - 2 r(τ)
    idx = jnp.arange(lag_max + 1)
    e_head = jnp.take_along_axis(
        jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1),
        (win - idx)[None, None, :].astype(jnp.int32).repeat(T, axis=1).repeat(B, axis=0),
        axis=-1,
    )  # Σ x²[0 : W-τ]
    e_tail = total - jnp.take_along_axis(
        jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1),
        idx[None, None, :].astype(jnp.int32).repeat(T, axis=1).repeat(B, axis=0),
        axis=-1,
    )  # Σ x²[τ : W]
    d = e_head + e_tail - 2.0 * r
    d = jnp.maximum(d, 0.0)

    # cumulative mean normalized difference
    tau = jnp.arange(1, lag_max + 1, dtype=jnp.float32)
    cumsum_d = jnp.cumsum(d[..., 1:], axis=-1)
    cmnd = d[..., 1:] * tau / jnp.maximum(cumsum_d, 1e-12)
    cmnd = jnp.concatenate([jnp.ones_like(d[..., :1]), cmnd], axis=-1)  # (B, T, lag_max+1)

    lags = jnp.arange(lag_max + 1)
    in_range = (lags >= lag_min) & (lags <= lag_max - 1)
    masked = jnp.where(in_range[None, None, :], cmnd, jnp.inf)

    # first lag under threshold that is a local minimum; fall back to argmin
    left = jnp.concatenate([masked[..., :1], masked[..., :-1]], axis=-1)
    right = jnp.concatenate([masked[..., 1:], masked[..., -1:]], axis=-1)
    is_min = (masked <= left) & (masked < right) & (masked < threshold)
    first_idx = jnp.argmax(is_min, axis=-1)
    any_below = jnp.any(is_min, axis=-1)
    fallback = jnp.argmin(masked, axis=-1)
    best = jnp.where(any_below, first_idx, fallback)  # (B, T)

    # parabolic refinement
    li = jnp.clip(best - 1, 0, lag_max)
    ri = jnp.clip(best + 1, 0, lag_max)
    dl = jnp.take_along_axis(cmnd, li[..., None], axis=-1)[..., 0]
    dc = jnp.take_along_axis(cmnd, best[..., None], axis=-1)[..., 0]
    dr = jnp.take_along_axis(cmnd, ri[..., None], axis=-1)[..., 0]
    denom = dl - 2.0 * dc + dr
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (dl - dr) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag = best.astype(jnp.float32) + delta

    f0 = sr / jnp.maximum(lag, 1.0)
    voiced = any_below & (f0 >= fmin) & (f0 <= fmax)
    return jnp.where(voiced, f0, 0.0).astype(jnp.float32)
