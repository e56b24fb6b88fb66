"""Batched YIN and pYIN pitch trackers in JAX.

YIN (de Cheveigné & Kawahara 2002): the difference function is computed in
the lag domain with FFTs (d(τ) = r(0) + r_τ(0) - 2·r(τ)), normalized
cumulatively (CMND), thresholded, and refined with parabolic interpolation —
all static-shaped and batched so one jitted program labels a whole batch on
the TPU.

pYIN (Mauch & Dixon 2014) replaces the single CMND threshold with a beta
prior over thresholds and decodes the contour with a pitch-bin HMM.  The
candidate weights come out in closed form here: for threshold s the YIN
candidate is the *first* CMND local minimum below s, so the minimum at lag
τ_j with depth v_j is selected exactly by thresholds in (v_j, m_j] where
m_j is the running minimum of all earlier troughs — weight_j =
BetaCDF(m_j) − BetaCDF(v_j), a prefix-min and two betainc calls instead of a
per-threshold loop.  The Viterbi pass is a ``lax.scan`` in max-plus algebra
over [voiced pitch bins | unvoiced pitch bins] states, exploiting the
kron(switch, local) transition structure so each step is two dense
(B, n, n) reductions.
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


def _cmnd_frames(audio: jnp.ndarray, sr: int, hop_length: int, fmin: float, fmax: float):
    """Shared YIN front half: (B, N) -> CMND (B, T, lag_max+1) + lag bounds."""
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
    return cmnd, lag_min, lag_max


def _parabolic_refine(cmnd: jnp.ndarray, best: jnp.ndarray, lag_max: int):
    """Sub-lag refinement around integer lags ``best`` -> float lags."""
    li = jnp.clip(best - 1, 0, lag_max)
    ri = jnp.clip(best + 1, 0, lag_max)
    dl = jnp.take_along_axis(cmnd, li[..., None], axis=-1)[..., 0]
    dc = jnp.take_along_axis(cmnd, best[..., None], axis=-1)[..., 0]
    dr = jnp.take_along_axis(cmnd, ri[..., None], axis=-1)[..., 0]
    denom = dl - 2.0 * dc + dr
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (dl - dr) / denom, 0.0)
    return best.astype(jnp.float32) + jnp.clip(delta, -0.5, 0.5)


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
    cmnd, lag_min, lag_max = _cmnd_frames(audio, sr, hop_length, fmin, fmax)

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

    lag = _parabolic_refine(cmnd, best, lag_max)
    f0 = sr / jnp.maximum(lag, 1.0)
    voiced = any_below & (f0 >= fmin) & (f0 <= fmax)
    return jnp.where(voiced, f0, 0.0).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sr",
        "hop_length",
        "fmin",
        "fmax",
        "cents_per_bin",
        "switch_prob",
        "max_step_cents",
        "beta_a",
        "beta_b",
    ),
)
def pyin_batch(
    audio: jnp.ndarray,
    sr: int,
    hop_length: int,
    fmin: float = 40.0,
    fmax: float = 1100.0,
    cents_per_bin: float = 20.0,
    switch_prob: float = 0.01,
    max_step_cents: float = 450.0,
    beta_a: float = 2.0,
    beta_b: float = 18.0,
) -> jnp.ndarray:
    """pYIN: (B, N) waveforms -> (B, T) Hz contours, zeros on unvoiced frames.

    Probabilistic YIN voicing (beta(a, b) prior over CMND thresholds) with a
    Viterbi decode over ``cents_per_bin``-spaced pitch bins; ``switch_prob``
    is the per-frame voiced<->unvoiced transition probability and
    ``max_step_cents`` bounds the per-frame pitch movement (triangular local
    transition, as in Mauch & Dixon 2014 / librosa.pyin).
    """
    from jax.scipy.special import betainc

    audio = jnp.asarray(audio, dtype=jnp.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    B = audio.shape[0]
    cmnd, lag_min, lag_max = _cmnd_frames(audio, sr, hop_length, fmin, fmax)
    T = cmnd.shape[1]

    # ---- candidate troughs and their closed-form threshold weights -------
    lags = jnp.arange(lag_max + 1)
    in_range = (lags >= lag_min) & (lags <= lag_max - 1)
    left = jnp.concatenate([cmnd[..., :1], cmnd[..., :-1]], axis=-1)
    right = jnp.concatenate([cmnd[..., 1:], cmnd[..., -1:]], axis=-1)
    is_trough = (cmnd <= left) & (cmnd < right) & in_range[None, None, :]
    v = jnp.where(is_trough, cmnd, jnp.inf)  # (B, T, L+1)

    # exclusive prefix-min over lags: the shallowest earlier trough
    m = lax.associative_scan(jnp.minimum, v, axis=-1)
    m = jnp.concatenate([jnp.full_like(m[..., :1], jnp.inf), m[..., :-1]], axis=-1)

    def beta_cdf(x):
        return betainc(beta_a, beta_b, jnp.clip(x, 0.0, 1.0))

    # trough j is the first minimum below s exactly for s in (v_j, m_j]
    w = jnp.where(is_trough, jnp.maximum(beta_cdf(m) - beta_cdf(v), 0.0), 0.0)

    lag_refined = jnp.where(
        is_trough, _parabolic_refine_all(cmnd, lag_max), lags.astype(jnp.float32)[None, None, :]
    )
    freq = sr / jnp.maximum(lag_refined, 1.0)
    ok = is_trough & (freq >= fmin) & (freq <= fmax)
    w = jnp.where(ok, w, 0.0)

    # ---- bin the candidates ----------------------------------------------
    n_bins = int(math.ceil(1200.0 * math.log2(fmax / fmin) / cents_per_bin)) + 1
    bin_idx = jnp.clip(
        jnp.round(1200.0 * jnp.log2(jnp.maximum(freq, 1e-6) / fmin) / cents_per_bin).astype(
            jnp.int32
        ),
        0,
        n_bins - 1,
    )
    b_ix, t_ix = jnp.meshgrid(jnp.arange(B), jnp.arange(T), indexing="ij")
    b_ix = jnp.broadcast_to(b_ix[..., None], bin_idx.shape)
    t_ix = jnp.broadcast_to(t_ix[..., None], bin_idx.shape)
    obs_v = jnp.zeros((B, T, n_bins), jnp.float32).at[b_ix, t_ix, bin_idx].add(w)
    freq_num = jnp.zeros((B, T, n_bins), jnp.float32).at[b_ix, t_ix, bin_idx].add(w * freq)

    bin_centers = fmin * 2.0 ** (jnp.arange(n_bins) * cents_per_bin / 1200.0)
    f0_of_bin = jnp.where(obs_v > 1e-12, freq_num / jnp.maximum(obs_v, 1e-12), bin_centers)

    p_unvoiced = jnp.maximum(1.0 - jnp.sum(obs_v, axis=-1), 0.0)  # (B, T)
    obs_u = jnp.broadcast_to((p_unvoiced / n_bins)[..., None], obs_v.shape)
    log_obs_v = jnp.log(jnp.maximum(obs_v, 1e-12))
    log_obs_u = jnp.log(jnp.maximum(obs_u, 1e-12))

    # ---- HMM Viterbi over kron(switch, local) states ----------------------
    width = max(1, int(round(max_step_cents / cents_per_bin)))
    dist = np.abs(np.arange(n_bins)[:, None] - np.arange(n_bins)[None, :])
    local = np.maximum(1.0 - dist / (width + 1.0), 0.0)
    local = local / local.sum(axis=1, keepdims=True)
    log_local = jnp.asarray(np.log(np.maximum(local, 1e-30)), jnp.float32)
    log_stay = float(np.log1p(-switch_prob))
    log_switch = float(np.log(switch_prob))

    def step(prev, obs):
        # prev: (B, 2n) scores; obs: (log_obs_v_t, log_obs_u_t) each (B, n)
        lo_v, lo_u = obs
        pv, pu = prev[:, :n_bins], prev[:, n_bins:]
        sv = pv[:, :, None] + log_local[None]  # from-voiced local move
        su = pu[:, :, None] + log_local[None]  # from-unvoiced local move
        mv, av = jnp.max(sv, axis=1), jnp.argmax(sv, axis=1)
        mu, au = jnp.max(su, axis=1), jnp.argmax(su, axis=1)

        stay_v, cross_v = mv + log_stay, mu + log_switch
        from_v = stay_v >= cross_v
        score_v = jnp.where(from_v, stay_v, cross_v) + lo_v
        ptr_v = jnp.where(from_v, av, au + n_bins)

        stay_u, cross_u = mu + log_stay, mv + log_switch
        from_u = stay_u >= cross_u
        score_u = jnp.where(from_u, stay_u, cross_u) + lo_u
        ptr_u = jnp.where(from_u, au + n_bins, av)

        nxt = jnp.concatenate([score_v, score_u], axis=-1)
        return nxt, jnp.concatenate([ptr_v, ptr_u], axis=-1)

    lo_v_t = jnp.swapaxes(log_obs_v, 0, 1)  # (T, B, n)
    lo_u_t = jnp.swapaxes(log_obs_u, 0, 1)
    init = jnp.concatenate([lo_v_t[0], lo_u_t[0]], axis=-1)
    final, backptrs = lax.scan(step, init, (lo_v_t[1:], lo_u_t[1:]))

    last_state = jnp.argmax(final, axis=-1)  # (B,)

    def backtrace(state, ptrs):
        prev = jnp.take_along_axis(ptrs, state[:, None], axis=-1)[:, 0]
        return prev, prev

    _, states_rev = lax.scan(backtrace, last_state, backptrs, reverse=True)
    states = jnp.concatenate([states_rev, last_state[None, :]], axis=0)  # (T, B)
    states = jnp.swapaxes(states, 0, 1)  # (B, T)

    voiced = states < n_bins
    pitch_bin = jnp.where(voiced, states, 0)
    f0 = jnp.take_along_axis(f0_of_bin, pitch_bin[..., None], axis=-1)[..., 0]
    return jnp.where(voiced, f0, 0.0).astype(jnp.float32)


def _parabolic_refine_all(cmnd: jnp.ndarray, lag_max: int) -> jnp.ndarray:
    """Vectorized sub-lag refinement at every lag position -> float lags."""
    dl = jnp.concatenate([cmnd[..., :1], cmnd[..., :-1]], axis=-1)
    dr = jnp.concatenate([cmnd[..., 1:], cmnd[..., -1:]], axis=-1)
    denom = dl - 2.0 * cmnd + dr
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (dl - dr) / denom, 0.0)
    lags = jnp.arange(lag_max + 1, dtype=jnp.float32)
    return lags[None, None, :] + jnp.clip(delta, -0.5, 0.5)
