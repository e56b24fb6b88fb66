#!/usr/bin/env python
"""Generate a training corpus with exact analytic F0 labels.

Utterances come from the framework's own harmonic synthesizer
(data/synthetic.py): a vowel-formant majority plus a pure-tone /
sparse-partial share (round-2 domain-gap fix — the robustness suites
evaluate on single-partial sines).  Each file is written as WAV with its
analytic contour in the legacy ``_f0.npy`` cache format (loaded verbatim by
the data layer, reference meldataset.py:598-603), so training supervision is
exact by construction.

A third stimulus class (``sweep_share``) covers the dynamic-pitch domain the
robustness suites probe and slow vowel segments do not: piecewise log-linear
sweeps with node slew up to ~13 octaves/s across 60-950 Hz and vibrato up to
260 cents deep at 2-10 Hz (the suite grid tops out at 200 cents / 8 Hz and
60->500 Hz glides in 0.4 s, Utils/dynamic_pitch_behavior.ipynb).  Round-2d
adds ``burst_share`` (short voiced bursts in mostly-silent files),
``glide_share`` (whole-file monotone glides), and ``augment_share``
(label-preserving degradations: lowpass, hard clip, AGC pumping, noise —
the robustness suites' corruption families).

Usage:
  python tools/make_corpus.py --root Data/corpus_r2 [--n 300] [--tone-share 0.4]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np

SR = 24000
HOP = 300


def _sweep_tone(rng: np.random.Generator, duration: float):
    """Fast piecewise log-linear sweep with optional deep vibrato.

    Returns (waveform float32, frame contour float32) with exact analytic F0.
    """
    n = int(SR * duration)
    t = np.arange(n) / SR

    n_nodes = int(rng.integers(3, 9))
    node_t = np.sort(rng.uniform(0.0, duration, n_nodes))
    node_t[0], node_t[-1] = 0.0, duration
    node_f = np.exp(rng.uniform(np.log(60.0), np.log(950.0), n_nodes))
    f0 = np.exp(np.interp(t, node_t, np.log(node_f)))

    if rng.random() < 0.8:
        rate = rng.uniform(2.0, 10.0)
        # Mixture re-shaped for round 2d: the deep rows (>~120c at 6-8 Hz)
        # are analysis-window-limited (RESULTS.md), so most mass goes to the
        # shallow/moderate band where the suites are winnable and the
        # round-2c model still lost accuracy (60c @ 6-8 Hz).
        if rng.random() < 0.7:
            depth_cents = rng.uniform(20.0, 120.0)
        else:
            depth_cents = rng.uniform(120.0, 260.0)
        f0 = f0 * 2.0 ** ((depth_cents / 1200.0) * np.sin(2 * np.pi * rate * t))

    phase = 2 * np.pi * np.cumsum(f0) / SR
    n_partials = int(rng.integers(1, 5))
    rolloff = rng.uniform(0.3, 0.7)
    x = np.zeros(n)
    for k in range(1, n_partials + 1):
        if k * f0.max() < SR / 2:
            x += (rolloff ** (k - 1)) * np.sin(k * phase)
    peak = np.abs(x).max()
    if peak > 0:
        x *= rng.uniform(0.25, 0.6) / peak
    x += 10.0 ** (-50.0 / 20.0) * rng.standard_normal(n)

    n_frames = 1 + n // HOP
    frame_idx = np.minimum(np.arange(n_frames) * HOP, n - 1)
    return x.astype(np.float32), f0[frame_idx].astype(np.float32)


def _glide_tone(rng: np.random.Generator, duration: float):
    """Whole-file monotone log-linear glide (suite's glide stimuli).

    The dynamic-pitch suite sweeps 60->500 Hz across the entire file over
    0.4-3.2 s (eval/stimuli.py); the node-based sweep class rarely produces
    a clean monotone run over the full span, so this class supplies it:
    >=1-octave log-linear glide spanning the whole voiced duration, with an
    optional shallow vibrato overlay.
    """
    n = int(SR * duration)
    t = np.arange(n) / SR

    lo, hi = np.log(60.0), np.log(520.0)
    while True:
        a, b = rng.uniform(lo, hi, 2)
        if abs(a - b) >= np.log(2.0):
            break
    f0 = np.exp(a + (b - a) * t / duration)
    if rng.random() < 0.25:
        rate = rng.uniform(3.0, 8.0)
        depth = rng.uniform(20.0, 60.0)
        f0 = f0 * 2.0 ** ((depth / 1200.0) * np.sin(2 * np.pi * rate * t))

    phase = 2 * np.pi * np.cumsum(f0) / SR
    n_partials = int(rng.integers(1, 5))
    rolloff = rng.uniform(0.3, 0.7)
    x = np.zeros(n)
    for k in range(1, n_partials + 1):
        if k * f0.max() < SR / 2:
            x += (rolloff ** (k - 1)) * np.sin(k * phase)
    fade = int(0.01 * SR)
    env = np.ones(n)
    env[:fade] = np.linspace(0.0, 1.0, fade)
    env[-fade:] = np.linspace(1.0, 0.0, fade)
    x *= env
    peak = np.abs(x).max()
    if peak > 0:
        x *= rng.uniform(0.25, 0.6) / peak
    x += 10.0 ** (-50.0 / 20.0) * rng.standard_normal(n)

    n_frames = 1 + n // HOP
    frame_idx = np.minimum(np.arange(n_frames) * HOP, n - 1)
    return x.astype(np.float32), f0[frame_idx].astype(np.float32)


def _vibrato_tone(rng: np.random.Generator, duration: float):
    """Full-file steady-base vibrato (suite's vibrato grid domain).

    The stage-d model predicts near the vibrato MEAN on 60-200 cent rows
    (RPA ~ asin(50/depth)/(pi/2) — the flat-contour signature): fast
    oscillations are averaged away because training contours are mostly
    slow.  This class supplies full-file constant-base vibrato with depth
    mass in the winnable 40-150 cent band at 4-10 Hz so the recurrent head
    must reproduce the oscillation, not its mean.
    """
    n = int(SR * duration)
    t = np.arange(n) / SR
    base = np.exp(rng.uniform(np.log(100.0), np.log(700.0)))
    rate = rng.uniform(4.0, 10.0)
    depth = rng.uniform(40.0, 150.0) if rng.random() < 0.75 else rng.uniform(150.0, 250.0)
    f0 = base * 2.0 ** ((depth / 1200.0) * np.sin(2 * np.pi * rate * t + rng.uniform(0, 2 * np.pi)))
    return _render_partials(rng, f0, n_partials_max=3), f0[_frame_idx(n)].astype(np.float32)


def _wander_tone(rng: np.random.Generator, duration: float):
    """Slow deep pitch wander (degradation suites' base stimulus family).

    The codec/room/noise suites ride a 0.2-0.5-octave sinusoidal wander
    (eval/suites.py wander_curve) and the stage-d model under-tracks the
    wide excursions even at <=1 Hz (clean baseline RPA 0.56-0.73).  Depth
    0.15-0.7 octaves at 0.3-1.5 Hz, random base/phase.
    """
    n = int(SR * duration)
    t = np.arange(n) / SR
    base = np.exp(rng.uniform(np.log(120.0), np.log(450.0)))
    depth_oct = rng.uniform(0.15, 0.7)
    rate = rng.uniform(0.3, 1.5)
    f0 = base * 2.0 ** (depth_oct * np.sin(2 * np.pi * rate * t + rng.uniform(0, 2 * np.pi)))
    f0 = np.clip(f0, 60.0, 950.0)
    return _render_partials(rng, f0, n_partials_max=4), f0[_frame_idx(n)].astype(np.float32)


def _frame_idx(n: int) -> np.ndarray:
    return np.minimum(np.arange(1 + n // HOP) * HOP, n - 1)


def _render_partials(rng: np.random.Generator, f0: np.ndarray, n_partials_max: int):
    """Render an F0 curve as 1..n_partials_max harmonics + fade + noise floor."""
    n = len(f0)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    n_partials = int(rng.integers(1, n_partials_max + 1))
    rolloff = rng.uniform(0.3, 0.7)
    x = np.zeros(n)
    for k in range(1, n_partials + 1):
        if k * f0.max() < SR / 2:
            x += (rolloff ** (k - 1)) * np.sin(k * phase)
    fade = int(0.01 * SR)
    env = np.ones(n)
    env[:fade] = np.linspace(0.0, 1.0, fade)
    env[-fade:] = np.linspace(1.0, 0.0, fade)
    x *= env
    peak = np.abs(x).max()
    if peak > 0:
        x *= rng.uniform(0.25, 0.6) / peak
    x += 10.0 ** (-50.0 / 20.0) * rng.standard_normal(n)
    return x.astype(np.float32)


# relative draw weights for the six augment kinds (lowpass, clip, agc,
# white, pink, reverb); stage configs override via --augment-weights
_AUGMENT_WEIGHTS = np.ones(6)


def _augment(rng: np.random.Generator, wave: np.ndarray) -> np.ndarray:
    """Label-preserving signal degradation (round-2d robustness mix).

    One random corruption per call, mirroring the robustness suites'
    degradation families (eval/suites.py): band-limiting (codec/bandwidth),
    hard clipping + AGC pumping (amplitude pathologies), additive white or
    pink noise (noise robustness — the suite's pink rows mask the low
    harmonics and were the round-2g failure mode), and synthetic reverb
    (room stress, exponential-decay noise RIR at T60 0.2-1.0 s).  None of
    these move F0, so the analytic labels stay exact.
    """
    kind = int(rng.choice(6, p=_AUGMENT_WEIGHTS / _AUGMENT_WEIGHTS.sum()))
    if kind == 0:  # brickwall lowpass at 2-8 kHz (keeps >=4 harmonics at 500 Hz)
        cutoff_hz = rng.uniform(2000.0, 8000.0)
        spec = np.fft.rfft(wave)
        freqs = np.fft.rfftfreq(len(wave), 1.0 / SR)
        spec[freqs > cutoff_hz] = 0.0
        return np.fft.irfft(spec, n=len(wave)).astype(np.float32)
    if kind == 1:  # quantile hard clip, 90-99.5th percentile of |x|
        q = rng.uniform(0.90, 0.995)
        nz = np.abs(wave[np.abs(wave) > 1e-6])
        if nz.size == 0:
            return wave
        thr = float(np.quantile(nz, q))
        return np.clip(wave, -thr, thr).astype(np.float32)
    if kind == 2:  # AGC pumping: slow sinusoidal gain sweep, up to +/-9 dB
        depth_db = rng.uniform(2.0, 9.0)
        rate = rng.uniform(0.3, 2.0)
        t = np.arange(len(wave)) / SR
        gain = 10.0 ** (
            (depth_db / 20.0) * np.sin(2 * np.pi * rate * t + rng.uniform(0, 2 * np.pi))
        )
        return (wave * gain).astype(np.float32)
    if kind == 3:  # white noise at SNR 5-30 dB over the voiced-region power
        power = float(np.mean(wave**2))
        if power <= 0:
            return wave
        snr_db = rng.uniform(5.0, 30.0)
        noise_std = np.sqrt(power / 10.0 ** (snr_db / 10.0))
        return (wave + noise_std * rng.standard_normal(len(wave))).astype(np.float32)
    if kind == 4:  # pink (1/f) noise at SNR 0-20 dB — masks the fundamental
        power = float(np.mean(wave**2))
        if power <= 0:
            return wave
        snr_db = rng.uniform(0.0, 20.0)
        spec = np.fft.rfft(rng.standard_normal(len(wave)))
        freqs = np.fft.rfftfreq(len(wave), 1.0 / SR)
        spec /= np.sqrt(np.maximum(freqs, freqs[1]))  # 1/f power spectrum
        pink = np.fft.irfft(spec, n=len(wave))
        pink /= max(float(np.std(pink)), 1e-12)
        noise_std = np.sqrt(power / 10.0 ** (snr_db / 10.0))
        return (wave + noise_std * pink).astype(np.float32)
    # kind == 5: synthetic reverb — exponential-decay noise RIR; training
    # T60 range extends past the eval grid's 1.0 s so the hardest suite row
    # sits inside the training distribution.
    #
    # Two D/R regimes (stage-m fix): the original formulation L2-normalised
    # [direct=1, noise tail] — tail energy ~1000x direct (≈ -30 dB
    # direct-to-reverberant), far wetter than the eval room model
    # (dsp/filters.synthesize_rir: tail peak-scaled to 0.25 against a unit
    # direct ≈ -6.5 dB D/R).  Training on only the extreme regime left the
    # suite's moderate rooms out-of-distribution (suites_k room t60_0.6
    # RPA 0.71).  Default draw: 75% eval-matched D/R (tail peak scale
    # 0.1-0.6 bracketing the suite's 0.25), 25% legacy ultra-wet.
    t60 = rng.uniform(0.2, 1.3)
    rir_len = max(int(t60 * SR), 240)
    t = np.arange(rir_len) / SR
    tail = rng.standard_normal(rir_len) * np.exp(-6.9078 * t / t60)  # ln(1e3)
    if rng.uniform() < 0.75:
        # eval-matched regime: unit direct path + peak-scaled noise tail
        # (randomised around synthesize_rir's direct_gain=1.0, tail 0.25)
        rir = tail * (rng.uniform(0.1, 0.6) / max(float(np.max(np.abs(tail))), 1e-9))
        rir[int(rng.uniform(0.0, 0.004) * SR)] += 1.0
    else:
        # legacy ultra-wet regime (direct buried in the tail)
        rir = tail
        rir[0] = 1.0
        rir /= max(float(np.sqrt(np.sum(rir**2))), 1e-12)
    wet = np.fft.irfft(
        np.fft.rfft(wave, n=len(wave) + rir_len) * np.fft.rfft(rir, n=len(wave) + rir_len)
    )[: len(wave)]
    peak = float(np.max(np.abs(wet)))
    if peak > 0.99:
        wet = wet * (0.99 / peak)
    return wet.astype(np.float32)


def _burst_tone(rng: np.random.Generator, duration: float):
    """Short voiced burst inside an otherwise-silent file.

    Covers the suites' short stimuli (e.g. a 0.4 s glide is the entire
    file, dynamic_pitch_tools.py): a 0.3-1.4 s glide-or-vibrato tone at a
    random offset, zeros elsewhere — so chunked inference over mostly-padded
    windows is in the training domain.
    """
    n = int(SR * duration)
    voiced_s = rng.uniform(0.3, 1.4)
    nv = int(SR * voiced_s)
    start = int(rng.uniform(0.0, max(duration - voiced_s, 1e-3)) * SR)
    tv = np.arange(nv) / SR

    f_a = np.exp(rng.uniform(np.log(60.0), np.log(900.0)))
    f_b = np.exp(rng.uniform(np.log(60.0), np.log(900.0)))
    f0v = f_a * (f_b / f_a) ** (tv / voiced_s)  # log-linear glide (or ~flat)
    if rng.random() < 0.5:
        rate = rng.uniform(3.0, 9.0)
        depth = rng.uniform(20.0, 220.0)
        f0v = f0v * 2.0 ** ((depth / 1200.0) * np.sin(2 * np.pi * rate * tv))

    phase = 2 * np.pi * np.cumsum(f0v) / SR
    n_partials = int(rng.integers(1, 4))
    rolloff = rng.uniform(0.3, 0.7)
    xv = np.zeros(nv)
    for k in range(1, n_partials + 1):
        if k * f0v.max() < SR / 2:
            xv += (rolloff ** (k - 1)) * np.sin(k * phase)
    fade = min(int(0.02 * SR), nv // 4)
    env = np.ones(nv)
    env[:fade] = np.linspace(0.0, 1.0, fade)
    env[-fade:] = np.linspace(1.0, 0.0, fade)
    xv *= env
    peak = np.abs(xv).max()
    if peak > 0:
        xv *= rng.uniform(0.25, 0.6) / peak

    x = np.zeros(n)
    x[start : start + nv] = xv
    x += 10.0 ** (-55.0 / 20.0) * rng.standard_normal(n)

    f0 = np.zeros(n)
    f0[start : start + nv] = f0v
    n_frames = 1 + n // HOP
    frame_idx = np.minimum(np.arange(n_frames) * HOP, n - 1)
    return x.astype(np.float32), f0[frame_idx].astype(np.float32)


def _steep_glide(rng: np.random.Generator, duration: float):
    """Short steep glide in an otherwise silent file (dynamic-pitch glide
    rows: 60→500 Hz in 0.4-0.8 s is ~4-8 octaves/s — far outside the
    whole-file glide class's ≤1 oct/s range, and the round-2j residual)."""
    n = int(SR * duration)
    span_s = rng.uniform(0.3, 1.2)
    nv = min(int(SR * span_s), n)
    # bias toward file start: eval glides begin at t=0
    start = 0 if rng.random() < 0.5 else int(rng.uniform(0, n - nv))
    tv = np.arange(nv) / SR
    octaves = rng.uniform(1.5, 3.0) * (1 if rng.random() < 0.5 else -1)  # span 60-520 Hz is 3.12 oct
    lo, hi = np.log2(60.0), np.log2(520.0)
    a = rng.uniform(max(lo, lo - min(octaves, 0)), min(hi, hi - max(octaves, 0)))
    f0v = 2.0 ** (a + octaves * tv / span_s)

    phase = 2 * np.pi * np.cumsum(f0v) / SR
    n_partials = int(rng.integers(1, 5))
    rolloff = rng.uniform(0.3, 0.7)
    xv = np.zeros(nv)
    for k in range(1, n_partials + 1):
        if k * f0v.max() < SR / 2:
            xv += (rolloff ** (k - 1)) * np.sin(k * phase)
    fade = max(int(0.01 * SR), 1)
    env = np.ones(nv)
    env[:fade] = np.linspace(0.0, 1.0, fade)
    env[-fade:] = np.linspace(1.0, 0.0, fade)
    xv *= env
    peak = np.abs(xv).max()
    if peak > 0:
        xv *= rng.uniform(0.25, 0.6) / peak

    x = np.zeros(n)
    x[start : start + nv] = xv
    x += 10.0 ** (-55.0 / 20.0) * rng.standard_normal(n)
    f0 = np.zeros(n)
    f0[start : start + nv] = f0v
    n_frames = 1 + n // HOP
    frame_idx = np.minimum(np.arange(n_frames) * HOP, n - 1)
    return x.astype(np.float32), f0[frame_idx].astype(np.float32)


_VOWEL_FORMANTS = [
    # (F1, F2, F3) Hz — canonical targets for /a e i o u/
    (800.0, 1200.0, 2500.0),
    (400.0, 2000.0, 2600.0),
    (300.0, 2300.0, 3000.0),
    (500.0, 900.0, 2400.0),
    (350.0, 800.0, 2300.0),
]


def _shaped_noise(rng: np.random.Generator, m: int, lo_hz: float, hi_hz: float) -> np.ndarray:
    """Band-shaped white noise (raised-cosine skirts) for bursts/fricatives."""
    spec = np.fft.rfft(rng.standard_normal(m))
    freqs = np.fft.rfftfreq(m, 1.0 / SR)
    gain = np.ones_like(freqs)
    gain[freqs < lo_hz] = 0.5 * (1 + np.cos(np.pi * np.clip((lo_hz - freqs[freqs < lo_hz]) / max(lo_hz, 1.0), 0, 1)))
    gain[freqs > hi_hz] = 0.5 * (1 + np.cos(np.pi * np.clip((freqs[freqs > hi_hz] - hi_hz) / max(SR / 2 - hi_hz, 1.0), 0, 1)))
    out = np.fft.irfft(spec * gain, n=m)
    return out / max(float(np.std(out)), 1e-9)


def _speech_utterance(rng: np.random.Generator, duration: float):
    """Speech-like utterance: syllable train with consonant transients,
    coarticulated formant motion, breathiness, jitter/shimmer and syllabic
    AM (VERDICT r3 #8 — the classes real recordings have and the tone/vowel
    corpus lacked; reference README.md:31 trains on real wav lists).

    All voiced frames carry exact analytic F0 labels; consonants, closures
    and word gaps are exact unvoiced (0) frames — so the class also trains
    rapid voiced/unvoiced alternation at speech rates, which none of the
    tone classes exercise.
    """
    n = int(SR * duration)
    x = np.zeros(n)
    f0 = np.zeros(n)
    base = np.exp(rng.uniform(np.log(90.0), np.log(280.0)))  # speaker register
    decl_oct = rng.uniform(0.0, 0.35)  # utterance-level declination
    pos = int(rng.uniform(0.0, 0.15) * SR)
    min_tail = int(0.12 * SR)
    while pos < n - min_tail:
        if rng.random() < 0.25:  # word boundary gap
            pos += int(rng.uniform(0.05, 0.25) * SR)
            continue
        r = rng.random()
        if r < 0.4:  # plosive: closure silence + 3-15 ms wideband burst
            pos += int(rng.uniform(0.02, 0.06) * SR)
            bl = int(rng.uniform(0.003, 0.015) * SR)
            if pos + bl >= n:
                break
            burst = _shaped_noise(rng, bl, rng.uniform(700.0, 2000.0), rng.uniform(4000.0, 10000.0))
            burst *= np.exp(-np.arange(bl) / max(0.35 * bl, 1.0))  # sharp attack, fast decay
            x[pos : pos + bl] += rng.uniform(0.08, 0.3) * burst / max(float(np.max(np.abs(burst))), 1e-9)
            pos += bl + int(rng.uniform(0.0, 0.02) * SR)
        elif r < 0.7:  # fricative: 40-180 ms sustained shaped noise
            fl = int(rng.uniform(0.04, 0.18) * SR)
            if pos + fl >= n:
                break
            fric = _shaped_noise(rng, fl, rng.uniform(1500.0, 3500.0), rng.uniform(6000.0, 11000.0))
            env = np.sin(np.pi * np.arange(fl) / fl) ** 0.5  # smooth on/off
            x[pos : pos + fl] += rng.uniform(0.03, 0.12) * fric * env
            pos += fl
        # voiced nucleus with accent contour + coarticulated formants
        nl = int(rng.uniform(0.08, 0.45) * SR)
        nl = min(nl, n - pos - 1)
        if nl < int(0.05 * SR):
            break
        tv = np.arange(nl) / SR
        u = np.arange(nl) / max(nl - 1, 1)
        syl_base = base * 2.0 ** (-decl_oct * pos / n + rng.uniform(-2.0, 3.0) / 12.0)
        accent = (rng.uniform(-4.0, 6.0) / 12.0) * np.sin(np.pi * u)  # rise-fall
        # jitter: low-passed random F0 perturbation, ~±1%
        jit = np.cumsum(rng.standard_normal(nl))
        jit = 0.01 * jit / max(float(np.std(jit)), 1e-9)
        f0v = np.clip(syl_base * 2.0**accent * (1.0 + jit), 60.0, 500.0)
        phase = 2 * np.pi * np.cumsum(f0v) / SR
        # formant crossfade between two vowel targets (coarticulation)
        va, vb = (_VOWEL_FORMANTS[i] for i in rng.choice(len(_VOWEL_FORMANTS), 2, replace=False))
        n_part = int(min(28, (SR / 2 - 200.0) / float(f0v.max())))
        xv = np.zeros(nl)
        for k in range(1, max(n_part, 1) + 1):
            fk = k * f0v  # (nl,) time-varying partial frequency
            gain = np.full(nl, 1e-2)
            for j in range(3):
                fc = (1.0 - u) * va[j] + u * vb[j]
                bw = (90.0, 120.0, 160.0)[j]
                gain += 1.0 / (1.0 + ((fk - fc) / bw) ** 2)
            xv += (gain / k**0.7) * np.sin(k * phase)
        # breathiness: aspiration noise tied to the voiced envelope
        asp = _shaped_noise(rng, nl, 1500.0, 9000.0)
        xv += rng.uniform(0.03, 0.22) * float(np.std(xv)) * asp
        # shimmer + syllabic AM
        am = 1.0 + rng.uniform(0.05, 0.3) * np.sin(
            2 * np.pi * rng.uniform(2.0, 8.0) * tv + rng.uniform(0, 2 * np.pi)
        )
        edge = max(int(0.012 * SR), 1)
        env = np.ones(nl)
        env[:edge] = np.linspace(0.0, 1.0, edge)
        env[-edge:] = np.linspace(1.0, 0.0, edge)
        xv *= am * env
        peak = float(np.max(np.abs(xv)))
        if peak > 0:
            xv *= rng.uniform(0.25, 0.6) / peak
        x[pos : pos + nl] += xv
        f0[pos : pos + nl] = f0v
        pos += nl + int(rng.uniform(0.0, 0.06) * SR)

    x += 10.0 ** (-52.0 / 20.0) * rng.standard_normal(n)
    peak = float(np.max(np.abs(x)))
    if peak > 0.95:
        x *= 0.95 / peak
    return x.astype(np.float32), f0[_frame_idx(n)].astype(np.float32)


def make_corpus(
    root: str,
    n: int = 300,
    n_val: int = 40,
    tone_share: float = 0.4,
    sweep_share: float = 0.0,
    burst_share: float = 0.0,
    glide_share: float = 0.0,
    vibrato_share: float = 0.0,
    wander_share: float = 0.0,
    steepglide_share: float = 0.0,
    speech_share: float = 0.0,
    augment_share: float = 0.0,
    seed: int = 11,
    min_duration: float = 2.6,
    max_duration: float = 3.2,
    tone_partials_max: int = 4,
) -> dict:
    from pitchextractor_tpu.data.synthetic import HarmonicSynthesizer
    from pitchextractor_tpu.io import write_wav

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)

    base_cfg = {
        "duration": {"min": min_duration, "max": max_duration},
        "pitch_range": [80.0, 500.0],
        "pitch_log_uniform": True,
        "gain_db_range": [-18.0, -6.0],
        "noise_db": -50.0,
        "modulation": {
            "vibrato_probability": 0.5,
            "vibrato_semitones": 0.5,
            "vibrato_rate_range": [4.0, 8.0],
            "max_segments": 5,
        },
    }
    vowel_synth = HarmonicSynthesizer(SR, HOP, 1024, config=base_cfg, rng=rng)
    tone_synth = HarmonicSynthesizer(
        SR,
        HOP,
        1024,
        config={**base_cfg, "tone_probability": 1.0, "tone_partials_max": int(tone_partials_max)},
        rng=rng,
    )

    total = n + n_val
    paths = []
    for i in range(total):
        draw = rng.random()
        duration = rng.uniform(min_duration, max_duration)
        edges = np.cumsum(
            [
                sweep_share,
                burst_share,
                glide_share,
                vibrato_share,
                wander_share,
                steepglide_share,
                speech_share,
                tone_share,
            ]
        )
        if draw < edges[0]:
            wave, contour = _sweep_tone(rng, duration)
        elif draw < edges[1]:
            wave, contour = _burst_tone(rng, duration)
        elif draw < edges[2]:
            wave, contour = _glide_tone(rng, duration)
        elif draw < edges[3]:
            wave, contour = _vibrato_tone(rng, duration)
        elif draw < edges[4]:
            wave, contour = _wander_tone(rng, duration)
        elif draw < edges[5]:
            wave, contour = _steep_glide(rng, duration)
        elif draw < edges[6]:
            wave, contour = _speech_utterance(rng, duration)
        else:
            synth = tone_synth if draw < edges[7] else vowel_synth
            wave, contour = synth.generate()
        if rng.random() < augment_share:
            wave = _augment(rng, wave)
        # silence head/tail so voicing boundaries are trained too
        lead = int(SR * rng.uniform(0.05, 0.25))
        trail = int(SR * rng.uniform(0.05, 0.25))
        wave = np.concatenate([np.zeros(lead, np.float32), wave, np.zeros(trail, np.float32)])
        lead_frames = lead // HOP
        contour = np.concatenate(
            [
                np.zeros(lead_frames, np.float32),
                contour,
                np.zeros(1 + len(wave) // HOP - lead_frames - len(contour), np.float32),
            ]
        )
        path = os.path.join(root, f"utt_{i:04d}.wav")
        write_wav(path, wave, SR)
        np.save(path + "_f0.npy", contour.astype(np.float32))
        paths.append(path)

    order = rng.permutation(total)
    train_paths = [paths[i] for i in order[:n]]
    val_paths = [paths[i] for i in order[n:]]
    with open(os.path.join(root, "train_list.txt"), "w") as fh:
        fh.writelines(p + "|x\n" for p in train_paths)
    with open(os.path.join(root, "val_list.txt"), "w") as fh:
        fh.writelines(p + "|x\n" for p in val_paths)
    return {"train": len(train_paths), "val": len(val_paths), "root": root}


@click.command()
@click.option("--root", required=True, type=str)
@click.option("--n", default=300, type=int)
@click.option("--n-val", default=40, type=int)
@click.option("--tone-share", default=0.4, type=float)
@click.option("--sweep-share", default=0.0, type=float)
@click.option("--burst-share", default=0.0, type=float)
@click.option("--glide-share", default=0.0, type=float)
@click.option("--vibrato-share", default=0.0, type=float)
@click.option("--wander-share", default=0.0, type=float)
@click.option("--steepglide-share", default=0.0, type=float)
@click.option("--speech-share", default=0.0, type=float)
@click.option("--augment-share", default=0.0, type=float)
@click.option(
    "--augment-weights",
    default=None,
    type=str,
    help="six comma-separated draw weights: lowpass,clip,agc,white,pink,reverb",
)
@click.option(
    "--tone-partials-max",
    default=4,
    type=int,
    help="max harmonics for the tone class; 1 = pure sines (the robustness "
    "suites' single-partial regime, where the trained models show band "
    "holes — RESULTS round-4 leg D)",
)
@click.option("--seed", default=11, type=int)
def main(
    root,
    n,
    n_val,
    tone_share,
    sweep_share,
    burst_share,
    glide_share,
    vibrato_share,
    wander_share,
    steepglide_share,
    speech_share,
    augment_share,
    augment_weights,
    tone_partials_max,
    seed,
):
    if augment_weights:
        global _AUGMENT_WEIGHTS
        parts = [float(v) for v in augment_weights.split(",")]
        assert len(parts) == 6, "need six weights"
        _AUGMENT_WEIGHTS = np.asarray(parts)
    print(
        make_corpus(
            root,
            n,
            n_val,
            tone_share,
            sweep_share,
            burst_share,
            glide_share,
            vibrato_share,
            wander_share,
            steepglide_share,
            speech_share,
            augment_share,
            seed,
            tone_partials_max=tone_partials_max,
        )
    )


if __name__ == "__main__":
    main()
