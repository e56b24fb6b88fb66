"""Self-training for the SwiftF0-style spectrogram labeler.

Same bootstrap strategy as labels/crepe_train.py: synthetic utterances with
exact F0 provide (log-spectrogram patch, pitch-bin) pairs; the model trains
with softmax cross-entropy over its 200 log-spaced bins plus an auxiliary
"unvoiced" handling: unvoiced frames get a uniform target so their max
probability (the confidence signal) stays low.

``arch="v2"`` (default) trains the round-2 architecture: log-frequency
resampled input from a 2048-sample window with 2-D time×frequency convs —
the fix for the v1 model's <150 Hz weakness (RESULTS.md round 1).  The
training distribution reaches down to 45 Hz log-uniformly and mixes in
pure-tone/sparse-partial stimuli so the labeler covers the eval suites'
stimulus family.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.synthetic import HarmonicSynthesizer
from ..dsp.stft import stft_np
from .swiftf0 import (
    BIN_HI,
    BIN_LO,
    HOP_LENGTH,
    LOGF_BINS,
    N_FFT,
    N_FFT_V2,
    PITCH_BINS,
    TARGET_SAMPLE_RATE,
    SwiftF0Model,
    SwiftF0ModelV2,
    _pitch_bin_frequencies,
    logf_filterbank,
    save_swiftf0_weights,
)


def _f0_to_targets(f0: np.ndarray) -> np.ndarray:
    """Soft targets over log-spaced bins; uniform for unvoiced frames."""
    freqs = _pitch_bin_frequencies()
    log_bins = np.log(freqs)
    targets = np.full((f0.shape[0], PITCH_BINS), 1.0 / PITCH_BINS, dtype=np.float32)
    voiced = f0 > 0
    if voiced.any():
        logf = np.log(np.clip(f0[voiced], freqs[0], freqs[-1]))
        # Gaussian in log-frequency, std = half a bin spacing * 2
        std = 2.0 * (log_bins[1] - log_bins[0])
        t = np.exp(-0.5 * ((log_bins[None, :] - logf[:, None]) / std) ** 2)
        targets[voiced] = (t / t.sum(axis=1, keepdims=True)).astype(np.float32)
    return targets


def _make_patch(wave: np.ndarray, arch: str, logf_fb: Optional[np.ndarray]) -> np.ndarray:
    if arch == "v2":
        spec = np.abs(
            stft_np(wave, n_fft=N_FFT_V2, hop_length=HOP_LENGTH, win_length=N_FFT_V2)
        ).astype(np.float32)
        return np.log(logf_fb @ spec + 1e-8).T
    spec = np.abs(
        stft_np(wave, n_fft=N_FFT, hop_length=HOP_LENGTH, win_length=N_FFT)
    ).astype(np.float32)
    return np.log(spec[BIN_LO:BIN_HI, :].T + 1e-8)


def synthetic_spec_batches(
    frames_per_batch: int = 512,
    unvoiced_fraction: float = 0.25,
    seed: int = 0,
    arch: str = "v2",
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (spec patches (1, T, F), targets (T, bins)) forever."""
    rng = np.random.default_rng(seed)
    synth = HarmonicSynthesizer(
        sample_rate=TARGET_SAMPLE_RATE,
        hop_length=HOP_LENGTH,
        fft_size=N_FFT,
        config={
            "duration": {"min": 0.5, "max": 1.5},
            # down to 45 Hz: the v1 model's blind spot (VERDICT round-1 #6)
            "pitch_range": [45.0, 1800.0] if arch == "v2" else [50.0, 1800.0],
            "pitch_log_uniform": True,
            "gain_db_range": [-24.0, -3.0],
            "noise_db": -45.0,
            # cover the eval suites' single-partial stimuli too
            "tone_probability": 0.25 if arch == "v2" else 0.0,
            "tone_partials_max": 4,
        },
        rng=rng,
    )
    logf_fb = logf_filterbank() if arch == "v2" else None
    while True:
        specs = []
        f0s = []
        total = 0
        while total < frames_per_batch:
            if rng.random() < unvoiced_fraction:
                n = HOP_LENGTH * rng.integers(10, 30)
                level = 10.0 ** (rng.uniform(-60, -20) / 20.0)
                wave = (level * rng.standard_normal(n)).astype(np.float32)
                f0 = np.zeros(1 + n // HOP_LENGTH, dtype=np.float32)
            else:
                wave, f0 = synth.generate()
            patch = _make_patch(wave, arch, logf_fb)
            n = min(patch.shape[0], len(f0))
            specs.append(patch[:n])
            f0s.append(f0[:n])
            total += n
        spec_cat = np.concatenate(specs, axis=0)[:frames_per_batch]
        f0_cat = np.concatenate(f0s, axis=0)[:frames_per_batch]
        yield spec_cat[None, ...], _f0_to_targets(f0_cat)


def train_swiftf0(
    steps: int = 2000,
    frames_per_batch: int = 512,
    learning_rate: float = 3e-4,
    seed: int = 0,
    output_path: Optional[str] = None,
    log_every: int = 200,
    arch: str = "v2",
) -> dict:
    model = SwiftF0ModelV2() if arch == "v2" else SwiftF0Model()
    n_in = LOGF_BINS if arch == "v2" else BIN_HI - BIN_LO
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.zeros((1, 4, n_in)))
    params = variables["params"]
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, spec, targets):
        def loss_fn(p):
            logits = model.apply({"params": p}, spec)[0]  # (T, bins)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.sum(targets * logp, axis=-1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    batches = synthetic_spec_batches(
        frames_per_batch=frames_per_batch, seed=seed, arch=arch
    )
    for i in range(steps):
        spec, targets = next(batches)
        params, opt_state, loss = step_fn(params, opt_state, jnp.asarray(spec), jnp.asarray(targets))
        if log_every and (i + 1) % log_every == 0:
            print(f"[swiftf0-train] step {i + 1}/{steps} loss {float(loss):.4f}")

    variables = {"params": params}
    if output_path:
        save_swiftf0_weights(output_path, variables, fmt=2 if arch == "v2" else 1)
        calibration = calibrate_confidence(output_path)
        save_swiftf0_weights(
            output_path, variables, fmt=2 if arch == "v2" else 1, calibration=calibration
        )
        print(f"[swiftf0-train] confidence calibration c0={calibration[0]:.4f} s={calibration[1]:.4f}")
    return variables


def calibrate_confidence(weights_path: str, seed: int = 0):
    """Fit the logistic confidence map for a trained weights file.

    Cross-entropy against Gaussian-smoothed targets caps the raw softmax
    peak near the smoothed target's own peak (~0.2 at sigma=2 bins), so the
    official swift_f0 threshold scale (0.9 = standard operating point,
    reference f0_backends.py:384-393) doesn't transfer.  Measure the raw
    peak distribution on synthetic voiced (tones/harmonics/deep vibrato
    over 65-1000 Hz) vs unvoiced (silence/noise) frames and place the
    logistic so that confidence 0.9 falls at the gap between them:
    cut = sqrt(voiced_p5 * unvoiced_p99), s = gap/8, c0 = cut - s*ln 9.
    """
    from .swiftf0 import SwiftF0Labeler

    labeler = SwiftF0Labeler(weights_path=weights_path)
    labeler.calibration = None  # measure raw peaks
    sr = 24000
    n = sr
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)
    voiced, unvoiced = [], []
    for f in (65.0, 90.0, 130.0, 200.0, 320.0, 500.0, 750.0, 1000.0):
        for n_partials in (1, 3, 6):
            x = np.zeros(n)
            for k in range(1, n_partials + 1):
                if k * f < 8000.0:
                    x += (0.6 ** (k - 1)) * np.sin(2 * np.pi * k * f * t)
            x = (0.4 * x / max(np.abs(x).max(), 1e-9)).astype(np.float32)
            voiced.append(labeler.detect(x, sr)[1])
    for depth in (120.0, 200.0):
        f0 = 220.0 * 2.0 ** ((depth / 1200.0) * np.sin(2 * np.pi * 8.0 * t))
        x = (0.4 * np.sin(2 * np.pi * np.cumsum(f0) / sr)).astype(np.float32)
        voiced.append(labeler.detect(x, sr)[1])
    for amp in (0.0, 0.05, 0.2):
        x = (amp * rng.standard_normal(n)).astype(np.float32)
        unvoiced.append(labeler.detect(x, sr)[1])
    v = np.concatenate(voiced)
    u = np.concatenate(unvoiced)
    hi = float(np.quantile(v, 0.05))
    lo = float(max(np.quantile(u, 0.99), 1e-4))
    cut = float(np.sqrt(max(hi, lo * 1.01) * lo))
    s = max((hi - lo) / 8.0, 1e-3)
    c0 = cut - s * np.log(9.0)
    return float(c0), float(s)
