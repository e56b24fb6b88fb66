"""TPU-native batched pitch trackers.

The reference delegates classical pitch tracking to native C++ libraries —
WORLD harvest/dio via pyworld (f0_backends.py:109-148) and Praat's
autocorrelation method via parselmouth (f0_backends.py:437-578) — running one
utterance at a time inside CPU DataLoader worker processes.  Here the whole
tracker is a single jitted JAX program over a dense ``(batch, samples)``
tensor, so labeling runs on the TPU and scales with batch size:

1. frame the signal every ``hop`` samples with a long analysis window
   (``periods_per_window / min_pitch`` seconds, Hann-windowed, locally
   mean-subtracted),
2. compute the lag-domain normalized autocorrelation via rfft/irfft and
   divide out the window's own autocorrelation (Boersma 1993),
3. pick the top-K local maxima in the candidate lag range with parabolic
   interpolation as voiced candidates, plus one unvoiced candidate whose
   strength follows Praat's silence/voicing threshold formula,
4. run a Viterbi pass (``lax.scan``) with octave-jump and voiced/unvoiced
   transition costs to pick the smoothest path.

Everything is static-shaped (fixed K candidates, fixed frame count per input
length) so XLA compiles one program per (batch, length) bucket.  The FFTs and
the candidate scoring run on the VPU; the framing is a strided gather.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


class TrackerParams(NamedTuple):
    min_pitch: float = 40.0
    max_pitch: float = 1100.0
    silence_threshold: float = 0.03
    voicing_threshold: float = 0.45
    octave_cost: float = 0.01
    octave_jump_cost: float = 0.35
    voiced_unvoiced_cost: float = 0.14
    periods_per_window: float = 3.0
    max_candidates: int = 15


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


@functools.partial(
    jax.jit,
    static_argnames=("sr", "hop_length", "params"),
)
def track_pitch_batch(
    audio: jnp.ndarray,
    sr: int,
    hop_length: int,
    params: TrackerParams = TrackerParams(),
) -> jnp.ndarray:
    """Track F0 for a batch of waveforms.

    Args:
      audio: (B, N) float array.
      sr: sample rate in Hz.
      hop_length: analysis hop in samples (frame period = hop / sr).
      params: tracker hyperparameters (static; part of the compile key).

    Returns:
      (B, T) float32 contour in Hz with exact zeros on unvoiced frames,
      where T = 1 + N // hop_length (matching the mel frame count contract,
      dsp/stft.py ``frame_count``).
    """
    audio = jnp.asarray(audio, dtype=jnp.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    B, N = audio.shape

    win = int(round(params.periods_per_window * sr / params.min_pitch))
    win = max(win, 2 * int(math.ceil(sr / params.min_pitch)))
    lag_min = max(2, int(math.floor(sr / params.max_pitch)))
    lag_max = int(math.ceil(sr / params.min_pitch))
    nfft = _next_pow2(win + lag_max + 1)
    T = 1 + N // hop_length
    K = int(params.max_candidates)

    # --- frame extraction, centred on t = k * hop -----------------------
    pad = win // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad + win)), mode="constant")
    frames = lax.conv_general_dilated_patches(
        padded[:, None, :],
        filter_shape=(win,),
        window_strides=(hop_length,),
        padding="VALID",
    )  # (B, win, T_all)
    frames = frames[:, :, :T]
    frames = jnp.swapaxes(frames, 1, 2)  # (B, T, win)

    # local peak amplitude before windowing (for the silence decision)
    local_peak = jnp.max(jnp.abs(frames), axis=-1)  # (B, T)
    global_peak = jnp.maximum(jnp.max(local_peak, axis=-1, keepdims=True), 1e-12)

    # --- normalized autocorrelation -------------------------------------
    window = jnp.asarray(np.hanning(win).astype(np.float32))
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    fw = frames * window

    spec = jnp.fft.rfft(fw, n=nfft, axis=-1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[..., : lag_max + 1]
    r0 = jnp.maximum(ac[..., :1], 1e-12)
    r = ac / r0  # (B, T, lag_max+1)

    wspec = jnp.fft.rfft(window, n=nfft)
    wac = jnp.fft.irfft(wspec * jnp.conj(wspec), n=nfft)[: lag_max + 1]
    wac = wac / jnp.maximum(wac[0], 1e-12)
    r = r / jnp.maximum(wac, 1e-3)[None, None, :]

    # --- voiced candidates: top-K local maxima in the lag range ---------
    lags = jnp.arange(lag_max + 1, dtype=jnp.float32)
    valid = (lags[None, None, :] >= lag_min) & (lags[None, None, :] <= lag_max - 1)
    left = jnp.concatenate([r[..., :1], r[..., :-1]], axis=-1)
    right = jnp.concatenate([r[..., 1:], r[..., -1:]], axis=-1)
    is_peak = (r >= left) & (r > right) & valid
    peak_vals = jnp.where(is_peak, r, -jnp.inf)

    top_vals, top_idx = lax.top_k(peak_vals, K)  # (B, T, K)

    # parabolic interpolation around each peak
    li = jnp.clip(top_idx - 1, 0, lag_max)
    ri = jnp.clip(top_idx + 1, 0, lag_max)
    rl = jnp.take_along_axis(r, li, axis=-1)
    rc = jnp.take_along_axis(r, top_idx, axis=-1)
    rr = jnp.take_along_axis(r, ri, axis=-1)
    denom = rl - 2.0 * rc + rr
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (rl - rr) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag_refined = top_idx.astype(jnp.float32) + delta
    val_refined = rc - 0.25 * (rl - rr) * delta

    has_cand = jnp.isfinite(top_vals)
    freq = jnp.where(has_cand, sr / jnp.maximum(lag_refined, 1.0), 0.0)
    freq = jnp.where(
        (freq >= params.min_pitch) & (freq <= params.max_pitch), freq, 0.0
    )
    # Boersma's candidate strength: R = r(τ) − octave_cost·log₂(min_pitch·τ)
    # = r + octave_cost·log₂(f / min_pitch) — biases toward the higher octave
    # so subharmonic lags (whose corrected autocorrelation can tie or exceed
    # the true period's) do not win.
    strength = jnp.where(
        (freq > 0.0),
        jnp.minimum(val_refined, 1.0)
        + params.octave_cost * jnp.log2(jnp.maximum(freq, 1.0) / params.min_pitch),
        -1e9,
    )  # (B, T, K)

    # --- unvoiced candidate strength (Praat formula) --------------------
    intensity = local_peak / global_peak  # (B, T)
    unvoiced_strength = params.voicing_threshold + jnp.maximum(
        0.0,
        2.0
        - (intensity / (params.silence_threshold / (1.0 + params.voicing_threshold))),
    )

    # states: [K voiced candidates, 1 unvoiced]
    S = K + 1
    all_strength = jnp.concatenate([strength, unvoiced_strength[..., None]], axis=-1)
    all_freq = jnp.concatenate([freq, jnp.zeros((B, T, 1), freq.dtype)], axis=-1)

    # --- Viterbi ----------------------------------------------------------
    def transition_cost(f_prev, f_cur):
        # f_*: (B, S) each; -> (B, S_prev, S_cur)
        fp = f_prev[:, :, None]
        fc = f_cur[:, None, :]
        both_voiced = (fp > 0) & (fc > 0)
        one_voiced = (fp > 0) != (fc > 0)
        jump = params.octave_jump_cost * jnp.abs(
            jnp.log2(jnp.maximum(fp, 1e-3) / jnp.maximum(fc, 1e-3))
        )
        cost = jnp.where(both_voiced, jump, 0.0)
        cost = jnp.where(one_voiced, params.voiced_unvoiced_cost, cost)
        return cost

    strengths_t = jnp.swapaxes(all_strength, 0, 1)  # (T, B, S)
    freqs_t = jnp.swapaxes(all_freq, 0, 1)  # (T, B, S)

    def step(carry, inputs):
        score_prev, f_prev = carry
        strength_cur, f_cur = inputs
        cost = transition_cost(f_prev, f_cur)  # (B, S, S)
        total = score_prev[:, :, None] - cost  # (B, S_prev, S_cur)
        best_prev = jnp.argmax(total, axis=1)  # (B, S_cur)
        score_new = jnp.max(total, axis=1) + strength_cur
        return (score_new, f_cur), best_prev

    init = (strengths_t[0], freqs_t[0])
    (final_score, _), backptrs = lax.scan(
        step, init, (strengths_t[1:], freqs_t[1:])
    )  # backptrs: (T-1, B, S)

    last_state = jnp.argmax(final_score, axis=-1)  # (B,)

    def backtrace(state, ptrs):
        # ptrs[i] maps the state at frame i+1 to the best state at frame i;
        # carry in the state of frame i+1, emit (and carry out) frame i's.
        prev = jnp.take_along_axis(ptrs, state[:, None], axis=-1)[:, 0]
        return prev, prev

    _, states_rev = lax.scan(backtrace, last_state, backptrs, reverse=True)
    states = jnp.concatenate([states_rev, last_state[None, :]], axis=0)  # (T, B)

    f0_t = jnp.take_along_axis(freqs_t, states[:, :, None], axis=-1)[:, :, 0]
    return jnp.swapaxes(f0_t, 0, 1).astype(jnp.float32)  # (B, T)


def track_pitch(
    audio: np.ndarray,
    sr: int,
    hop_length: int,
    params: TrackerParams = TrackerParams(),
) -> np.ndarray:
    """Single-utterance convenience wrapper returning a numpy contour."""
    out = track_pitch_batch(jnp.asarray(audio)[None, :], sr, hop_length, params)
    return np.asarray(out[0], dtype=np.float64)
