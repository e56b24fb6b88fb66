"""CREPE flax labeler tests: architecture shapes, weight save/load round
trip, backend integration via the cascade, and a short self-training run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pitchextractor_tpu.labels.crepe import (
    CREPE_BINS,
    CREPE_SAMPLE_RATE,
    CREPE_WINDOW,
    CrepeLabeler,
    CrepeModel,
    bins_to_cents,
    cents_to_frequency,
    load_crepe_weights,
    save_crepe_weights,
)
from pitchextractor_tpu.labels.crepe_train import (
    _cents_to_bin_targets,
    synthetic_frame_batches,
    train_crepe,
)


def test_model_shapes():
    model = CrepeModel(capacity=4)  # tiny
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, CREPE_WINDOW)), train=False)
    logits = model.apply(variables, jnp.zeros((3, CREPE_WINDOW)), train=False)
    assert logits.shape == (3, CREPE_BINS)


def test_bin_frequency_mapping():
    # bin 0 = 31.70 Hz (torchcrepe: cents = 20·bin + 1997.3794, f = 10·2^(c/1200))
    f0_bin0 = float(cents_to_frequency(bins_to_cents(jnp.float32(0))))
    assert abs(f0_bin0 - 31.70) < 0.05
    f_ratio = float(
        cents_to_frequency(bins_to_cents(jnp.float32(60)))
        / cents_to_frequency(bins_to_cents(jnp.float32(0)))
    )
    assert abs(f_ratio - 2.0) < 1e-3  # 60 bins = 1200 cents = 1 octave


def test_weight_roundtrip(tmp_path):
    model = CrepeModel(capacity=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, CREPE_WINDOW)), train=False)
    path = str(tmp_path / "w.npz")
    save_crepe_weights(path, variables)
    loaded = load_crepe_weights(path, 4)
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(sorted(a, key=lambda v: v.size), sorted(b, key=lambda v: v.size)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_synthetic_batches_and_targets():
    gen = synthetic_frame_batches(batch_size=32, seed=0)
    frames, targets = next(gen)
    assert frames.shape == (32, CREPE_WINDOW)
    assert targets.shape == (32, CREPE_BINS)
    assert np.all(targets >= 0) and np.all(targets <= 1)
    # voiced rows have a clear peak; unvoiced rows all-zero
    row_max = targets.max(axis=1)
    assert (row_max > 0.9).sum() > 16
    assert (row_max == 0).sum() > 0
    t = _cents_to_bin_targets(np.array([bins_to_cents(np.array(100.0)), 0.0]))
    assert t[0].argmax() == 100 and t[1].sum() == 0


@pytest.mark.slow
def test_short_training_reduces_loss(tmp_path):
    """Smoke for the self-training path: the BCE loss must drop markedly in a
    short CPU run and produce loadable weights.  (Accuracy takes thousands of
    steps — the shipped weights/crepe_tiny.npz are trained on TPU via
    tools/train_crepe.py and validated in test_shipped_weights below.)"""
    import jax.numpy as jnp
    from pitchextractor_tpu.labels.crepe_train import synthetic_frame_batches
    from pitchextractor_tpu.labels.crepe import CrepeModel, CREPE_CAPACITIES

    path = str(tmp_path / "crepe_tiny.npz")
    variables = train_crepe(capacity="tiny", steps=120, batch_size=64, output_path=path, log_every=0)

    model = CrepeModel(capacity=CREPE_CAPACITIES["tiny"])
    frames, targets = next(synthetic_frame_batches(batch_size=64, seed=99))
    frames_n = (frames - frames.mean(-1, keepdims=True)) / np.maximum(frames.std(-1, keepdims=True), 1e-10)

    def bce(variables):
        logits = model.apply(variables, jnp.asarray(frames_n), train=False)
        return float(
            np.mean(np.maximum(logits, 0) - logits * targets + np.log1p(np.exp(-np.abs(logits))))
        )

    import jax

    fresh = model.init(jax.random.PRNGKey(1), jnp.zeros((1, CREPE_WINDOW)), train=False)
    assert bce(variables) < 0.6 * bce(fresh)
    CrepeLabeler(capacity="tiny", weights_path=path)  # loads cleanly


SHIPPED_WEIGHTS = "weights/crepe_tiny.npz"


@pytest.mark.skipif(
    not __import__("os").path.isfile(SHIPPED_WEIGHTS), reason="shipped weights absent"
)
def test_shipped_weights_accuracy():
    """The TPU-trained shipped weights must track clean tones."""
    labeler = CrepeLabeler(capacity="tiny", weights_path=SHIPPED_WEIGHTS)
    t = np.arange(CREPE_SAMPLE_RATE) / CREPE_SAMPLE_RATE
    for freq in (110.0, 220.0, 440.0):
        audio = (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        f0, periodicity = labeler.predict(audio, CREPE_SAMPLE_RATE, 256)
        voiced = f0[5:-5]
        cents_err = np.abs(1200 * np.log2(np.maximum(voiced, 1e-3) / freq))
        assert np.median(cents_err) < 50, (freq, np.median(cents_err))


SHIPPED_SMALL = "weights/crepe_small.npz"


@pytest.mark.skipif(
    not __import__("os").path.isfile(SHIPPED_SMALL), reason="small weights absent"
)
def test_shipped_crepe_small_full_band():
    """Round-2 gate: CREPE-small must hold median error < 50 cents down to
    65 Hz (the torchcrepe-quality-parity criterion from the round-1 review)."""
    labeler = CrepeLabeler(capacity="small", weights_path=SHIPPED_SMALL)
    t = np.arange(CREPE_SAMPLE_RATE) / CREPE_SAMPLE_RATE
    for freq in (65.0, 110.0, 220.0, 440.0, 880.0, 1000.0):
        phase = 2 * np.pi * freq * t
        audio = (
            0.3 * (np.sin(phase) + 0.4 * np.sin(2 * phase) + 0.2 * np.sin(3 * phase))
        ).astype(np.float32)
        f0, periodicity = labeler.predict(audio, CREPE_SAMPLE_RATE, 256)
        voiced = f0[5:-5]
        cents_err = np.abs(1200 * np.log2(np.maximum(voiced, 1e-3) / freq))
        assert np.median(cents_err) < 50, (freq, float(np.median(cents_err)))


SHIPPED_MEDIUM = "weights/crepe_medium.npz"


@pytest.mark.skipif(
    not __import__("os").path.isfile(SHIPPED_MEDIUM), reason="medium weights absent"
)
def test_shipped_crepe_medium_full_band():
    """CREPE-medium must at least match the small gate: median error < 50
    cents on harmonic tones across 65-1000 Hz."""
    labeler = CrepeLabeler(capacity="medium", weights_path=SHIPPED_MEDIUM)
    t = np.arange(CREPE_SAMPLE_RATE) / CREPE_SAMPLE_RATE
    for freq in (65.0, 110.0, 220.0, 440.0, 880.0, 1000.0):
        phase = 2 * np.pi * freq * t
        audio = (
            0.3 * (np.sin(phase) + 0.4 * np.sin(2 * phase) + 0.2 * np.sin(3 * phase))
        ).astype(np.float32)
        f0, periodicity = labeler.predict(audio, CREPE_SAMPLE_RATE, 256)
        voiced = f0[5:-5]
        cents_err = np.abs(1200 * np.log2(np.maximum(voiced, 1e-3) / freq))
        assert np.median(cents_err) < 50, (freq, float(np.median(cents_err)))


SHIPPED_LARGE = "weights/crepe_large.npz"


@pytest.mark.skipif(
    not __import__("os").path.isfile(SHIPPED_LARGE), reason="large weights absent"
)
def test_shipped_crepe_large_full_band():
    """CREPE-large: same 65-1000 Hz median-error gate as small/medium."""
    labeler = CrepeLabeler(capacity="large", weights_path=SHIPPED_LARGE)
    t = np.arange(CREPE_SAMPLE_RATE) / CREPE_SAMPLE_RATE
    for freq in (65.0, 110.0, 220.0, 440.0, 880.0, 1000.0):
        phase = 2 * np.pi * freq * t
        audio = (
            0.3 * (np.sin(phase) + 0.4 * np.sin(2 * phase) + 0.2 * np.sin(3 * phase))
        ).astype(np.float32)
        f0, periodicity = labeler.predict(audio, CREPE_SAMPLE_RATE, 256)
        voiced = f0[5:-5]
        cents_err = np.abs(1200 * np.log2(np.maximum(voiced, 1e-3) / freq))
        assert np.median(cents_err) < 50, (freq, float(np.median(cents_err)))


SHIPPED_FULL = "weights/crepe_full.npz"


@pytest.mark.skipif(
    not __import__("os").path.isfile(SHIPPED_FULL), reason="full weights absent"
)
def test_shipped_crepe_full_full_band():
    """CREPE-full: same 65-1000 Hz median-error gate as small/medium/large
    (reference torchcrepe capacity ladder tops out at 'full',
    f0_backends.py:184)."""
    labeler = CrepeLabeler(capacity="full", weights_path=SHIPPED_FULL)
    t = np.arange(CREPE_SAMPLE_RATE) / CREPE_SAMPLE_RATE
    for freq in (65.0, 110.0, 220.0, 440.0, 880.0, 1000.0):
        phase = 2 * np.pi * freq * t
        audio = (
            0.3 * (np.sin(phase) + 0.4 * np.sin(2 * phase) + 0.2 * np.sin(3 * phase))
        ).astype(np.float32)
        f0, periodicity = labeler.predict(audio, CREPE_SAMPLE_RATE, 256)
        voiced = f0[5:-5]
        cents_err = np.abs(1200 * np.log2(np.maximum(voiced, 1e-3) / freq))
        assert np.median(cents_err) < 50, (freq, float(np.median(cents_err)))


def test_torchcrepe_layout_conversion():
    """convert_crepe_weights maps a torchcrepe-layout state dict onto our
    flax tree (verified by loading and running the converted weights)."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "tools"))
    from convert_crepe_weights import convert_torch_state
    from pitchextractor_tpu.labels.crepe import _FILTERS, _WIDTHS, load_crepe_weights

    rng = np.random.default_rng(0)
    capacity = 4  # tiny
    state = {}
    in_ch = 1
    for i, (f, w) in enumerate(zip(_FILTERS, _WIDTHS), start=1):
        out_ch = f * capacity
        state[f"conv{i}.weight"] = rng.standard_normal((out_ch, in_ch, w, 1)).astype(np.float32)
        state[f"conv{i}.bias"] = rng.standard_normal(out_ch).astype(np.float32)
        state[f"conv{i}_BN.weight"] = np.ones(out_ch, np.float32)
        state[f"conv{i}_BN.bias"] = np.zeros(out_ch, np.float32)
        state[f"conv{i}_BN.running_mean"] = np.zeros(out_ch, np.float32)
        state[f"conv{i}_BN.running_var"] = np.ones(out_ch, np.float32)
        in_ch = out_ch
    # flattened feature size after 6 maxpools of 2: 1024/4 (stride) /2^6 -> 4
    feat = in_ch * 4
    state["classifier.weight"] = rng.standard_normal((CREPE_BINS, feat)).astype(np.float32)
    state["classifier.bias"] = np.zeros(CREPE_BINS, np.float32)

    arrays = convert_torch_state(state)
    import tempfile, os as _os2

    path = _os2.path.join(tempfile.mkdtemp(), "conv.npz")
    np.savez(path, **arrays)
    variables = load_crepe_weights(path, capacity)
    model = CrepeModel(capacity=capacity)
    logits = model.apply(variables, jnp.zeros((2, CREPE_WINDOW)), train=False)
    assert logits.shape == (2, CREPE_BINS)
    # conv kernel orientation: (W, in, out)
    assert variables["params"]["conv1"]["kernel"].shape == (_WIDTHS[0], 1, _FILTERS[0] * capacity)
