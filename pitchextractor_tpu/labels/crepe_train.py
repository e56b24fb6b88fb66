"""Self-training for the flax CREPE labeler.

The reference consumes *pretrained* torchcrepe weights; in a hermetic TPU
environment we can instead bootstrap CREPE weights from the framework's own
synthetic generators (harmonic formant vowels + analytic sine stimuli), whose
F0 is exact by construction (data/synthetic.py, eval/stimuli.py).  Targets
follow the CREPE paper: 360 20-cent bins, Gaussian-blurred one-hot (25-cent
std), binary cross-entropy per bin; unvoiced/noise frames get all-zero
targets so peak activation doubles as a periodicity signal — matching the
torchcrepe decoding semantics our backend uses.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.synthetic import HarmonicSynthesizer
from .crepe import (
    CREPE_BINS,
    CREPE_CAPACITIES,
    CREPE_SAMPLE_RATE,
    CREPE_WINDOW,
    CrepeModel,
    bins_to_cents,
    save_crepe_weights,
)

_CENTS_STD = 25.0


def _cents_to_bin_targets(cents: np.ndarray) -> np.ndarray:
    """Gaussian-blurred one-hot over the 360 bins; zeros for unvoiced."""
    bin_cents = bins_to_cents(np.arange(CREPE_BINS, dtype=np.float64))
    targets = np.exp(-0.5 * ((bin_cents[None, :] - cents[:, None]) / _CENTS_STD) ** 2)
    targets[cents <= 0] = 0.0
    return targets.astype(np.float32)


def synthetic_frame_batches(
    batch_size: int = 256,
    unvoiced_fraction: float = 0.2,
    fmin: float = 50.0,
    fmax: float = 1000.0,
    seed: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (frames (B, 1024) @16 kHz, bin targets (B, 360)) forever."""
    rng = np.random.default_rng(seed)
    synth = HarmonicSynthesizer(
        sample_rate=CREPE_SAMPLE_RATE,
        hop_length=CREPE_WINDOW,  # one frame per hop keeps labels trivial
        fft_size=1024,
        config={
            "duration": {"min": 0.3, "max": 0.8},
            "pitch_range": [fmin, fmax],
            "pitch_log_uniform": True,
            "gain_db_range": [-20.0, -3.0],
            "noise_db": -45.0,
            # cover the eval suites' pure-sine / sparse-partial stimuli
            "tone_probability": 0.25,
            "tone_partials_max": 4,
        },
        rng=rng,
    )
    while True:
        frames = np.zeros((batch_size, CREPE_WINDOW), dtype=np.float32)
        cents = np.zeros((batch_size,), dtype=np.float64)
        i = 0
        while i < batch_size:
            if rng.random() < unvoiced_fraction:
                # unvoiced: noise at random level, or near-silence
                level = 10.0 ** (rng.uniform(-60, -20) / 20.0)
                frames[i] = level * rng.standard_normal(CREPE_WINDOW)
                cents[i] = 0.0
                i += 1
                continue
            if rng.random() < 0.4:
                # harmonic vowel; per-hop contour -> window-CENTER label via
                # the log-midpoint of the bracketing hop values
                wave, f0 = synth.generate()
                f0 = np.asarray(f0, dtype=np.float64)
                center = f0.copy()
                both = (f0[:-1] > 0) & (f0[1:] > 0)
                center[:-1][both] = np.sqrt(f0[:-1][both] * f0[1:][both])
            else:
                # sine with exact F0: stationary, vibrato (to ~360 cents deep
                # at 2-9 Hz) or log-linear glide (to ~6 octaves/s) — the
                # dynamic-pitch domain the suites probe.  Labels are sampled
                # at the WINDOW CENTER: a start-of-window label is off by
                # half a window (32 ms), which at deep-vibrato slew rates is
                # hundreds of cents of systematic label error (round-2
                # labeler_ceiling: crepe_small 0.17-0.55 RPA on those rows).
                n = int(CREPE_WINDOW * rng.integers(2, 6))
                base = np.exp(rng.uniform(np.log(fmin), np.log(fmax)))
                t = np.arange(n) / CREPE_SAMPLE_RATE
                kind = rng.random()
                if kind < 0.4:
                    curve = np.full(n, base)
                elif kind < 0.75:
                    depth_oct = rng.uniform(0.0, 0.3)
                    rate = rng.uniform(2.0, 9.0)
                    curve = base * 2.0 ** (depth_oct * np.sin(2 * np.pi * rate * t))
                else:
                    target = np.exp(rng.uniform(np.log(fmin), np.log(fmax)))
                    curve = base * (target / base) ** (t / t[-1])
                curve = np.clip(curve, fmin, fmax)
                phase = np.cumsum(2 * np.pi * curve / CREPE_SAMPLE_RATE)
                wave = (10 ** (rng.uniform(-20, -3) / 20) * np.sin(phase)).astype(np.float32)
                center = curve[CREPE_WINDOW // 2 :: CREPE_WINDOW].astype(np.float64)
            n_frames = min(len(center), len(wave) // CREPE_WINDOW)
            for k in range(n_frames):
                if i >= batch_size:
                    break
                frames[i] = wave[k * CREPE_WINDOW : (k + 1) * CREPE_WINDOW]
                hz = float(center[k])
                cents[i] = 1200.0 * np.log2(hz / 10.0) if hz > 0 else 0.0
                i += 1
        yield frames, _cents_to_bin_targets(cents)


def train_crepe(
    capacity: str = "tiny",
    steps: int = 2000,
    batch_size: int = 256,
    learning_rate: float = 2e-4,
    seed: int = 0,
    output_path: Optional[str] = None,
    log_every: int = 200,
) -> dict:
    """Train a CREPE model on synthetic data; returns flax variables."""
    model = CrepeModel(capacity=CREPE_CAPACITIES[capacity])
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.zeros((1, CREPE_WINDOW)), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, batch_stats, opt_state, frames, targets):
        mean = jnp.mean(frames, axis=-1, keepdims=True)
        std = jnp.maximum(jnp.std(frames, axis=-1, keepdims=True), 1e-10)
        frames = (frames - mean) / std

        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                frames,
                train=True,
                mutable=["batch_stats"],
            )
            loss = jnp.mean(
                jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    batches = synthetic_frame_batches(batch_size=batch_size, seed=seed)
    for i in range(steps):
        frames, targets = next(batches)
        params, batch_stats, opt_state, loss = step_fn(
            params, batch_stats, opt_state, jnp.asarray(frames), jnp.asarray(targets)
        )
        if log_every and (i + 1) % log_every == 0:
            print(f"[crepe-train] step {i + 1}/{steps} loss {float(loss):.4f}")

    variables = {"params": params, "batch_stats": batch_stats}
    if output_path:
        save_crepe_weights(output_path, variables)
    return variables
