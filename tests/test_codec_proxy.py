"""In-tree lossy-codec proxy tests (dsp/codec_proxy.py) + honest-summary
reporting (eval/cli.summarize): the codec degradation family must actually
execute without ffmpeg, with proxy rows reported separately from real-codec
rows and skipped rows counted instead of silently absorbed."""

import numpy as np
import pytest

from pitchextractor_tpu.dsp.codec_proxy import (
    PROXY_CODECS,
    _mdct_matrix,
    _sine_window,
    alaw_roundtrip,
    mdct_codec_roundtrip,
    mulaw_roundtrip,
)

SR = 24000


def _tone(freq=220.0, seconds=1.0, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_mdct_transform_perfect_reconstruction():
    """Princen-Bradley: sine-windowed MDCT analysis + IMDCT overlap-add is
    identity (interior samples) with no quantization."""
    n = 64
    rng = np.random.default_rng(0)
    x = rng.standard_normal(8 * n)
    frames = 10
    padded = np.zeros((frames + 1) * n)
    padded[n : n + len(x)] = x
    C = _mdct_matrix(n)
    w = _sine_window(n)
    idx = np.arange(2 * n)[None, :] + (np.arange(frames) * n)[:, None]
    X = (padded[idx] * w[None, :]) @ C.T
    y_blocks = (X @ C) * (2.0 / n) * w[None, :]
    out = np.zeros_like(padded)
    for f in range(frames):
        out[f * n : f * n + 2 * n] += y_blocks[f]
    recon = out[n : n + len(x)]
    np.testing.assert_allclose(recon, x, atol=1e-10)


def test_mulaw_alaw_roundtrip_properties():
    x = _tone()
    for fn in (mulaw_roundtrip, alaw_roundtrip):
        y = fn(x, bits=8)
        assert y.shape == x.shape and y.dtype == np.float32
        # 8-bit companded: decent SNR but visibly quantized
        err = np.sqrt(np.mean((y - x) ** 2))
        sig = np.sqrt(np.mean(x**2))
        snr_db = 20 * np.log10(sig / max(err, 1e-12))
        assert 25 < snr_db < 60, snr_db
        # zero maps to (near) zero, sign is preserved
        assert abs(fn(np.zeros(8, np.float32))[0]) < 1e-6
        assert np.all(np.sign(y[np.abs(x) > 0.1]) == np.sign(x[np.abs(x) > 0.1]))
        # fewer bits -> strictly more distortion
        y4 = fn(x, bits=4)
        assert np.mean((y4 - x) ** 2) > np.mean((y - x) ** 2)


def test_mdct_codec_bitrate_monotonic():
    x = _tone()
    errs = {}
    for kbps in (16, 64, 256):
        y = mdct_codec_roundtrip(x, SR, kbps)
        assert y.shape == x.shape
        errs[kbps] = float(np.mean((y - x) ** 2))
    assert errs[16] > errs[64] > errs[256]
    # high bitrate is near-transparent on a tone
    assert errs[256] < 1e-4


def test_mdct_codec_lowrate_bandlimits():
    """At 16 kbps the proxy must kill far more high-band energy than 128."""
    rng = np.random.default_rng(1)
    x = (0.2 * rng.standard_normal(SR)).astype(np.float32)

    def hf_energy(sig):
        spec = np.abs(np.fft.rfft(sig))
        return float(np.sum(spec[len(spec) // 2 :] ** 2))

    lo = mdct_codec_roundtrip(x, SR, 16)
    hi = mdct_codec_roundtrip(x, SR, 128)
    assert hf_energy(lo) < 0.5 * hf_energy(hi)


def test_proxy_registry_callables():
    x = _tone(seconds=0.3)
    for name, fn in PROXY_CODECS.items():
        param = 8 if name in ("mulaw", "alaw") else 32
        y = fn(x, SR, param)
        assert np.asarray(y).shape == x.shape, name


def test_codec_suite_runs_proxy_rows():
    from tests.test_eval import _OraclePredictor
    from pitchextractor_tpu.eval.suites import codec_bandwidth_suite

    cfg = {
        "duration_seconds": 1.0,
        "resample_rates": [16000],
        "proxy_codecs": [("mulaw", 8), ("mdct", 32)],
    }
    rows = codec_bandwidth_suite(_OraclePredictor(), cfg)
    fams = {r.get("suite") for r in rows}
    assert "codec_proxy" in fams
    proxy_rows = [r for r in rows if r.get("suite") == "codec_proxy"]
    assert len(proxy_rows) == 2
    assert all(isinstance(r.get("RPA"), float) for r in proxy_rows)
    assert all(str(r["condition"]).startswith("proxy_") for r in proxy_rows)
    # real-codec rows: executed through the in-image codec libraries when
    # present (io/codecs_native.py), skipped-with-reason otherwise — never
    # silently missing
    import shutil

    from pitchextractor_tpu.io.codecs_native import available_codecs

    avail = available_codecs()
    have_ffmpeg = shutil.which("ffmpeg") is not None
    skipped = [r for r in rows if r.get("skipped")]
    real = [r for r in rows if r.get("suite") == "codec" and not r.get("skipped")]
    # default list: 2x libopus, 2x libmp3lame, 1x libtwolame, 2x aac
    expect_real = (
        2 * int(avail["libopus"])
        + 2 * int(avail["libmp3lame"])
        + int(avail["libtwolame"])
        + 2 * int(avail.get("aac", False))
    )
    if not have_ffmpeg:
        assert len(real) == expect_real
        assert len(skipped) == 7 - expect_real
        assert all(r["suite"] == "codec" for r in skipped)
    if expect_real:
        assert all(r.get("backend") == "native" for r in real)
        assert all(isinstance(r.get("RPA"), float) for r in real)


def test_summarize_reports_families_and_skips():
    from pitchextractor_tpu.eval.cli import summarize_results as summarize

    rows = [
        {"suite": "baseline", "condition": "clean", "RPA": 1.0},
        {"suite": "bandwidth", "condition": "roundtrip_16000", "RPA": 0.9},
        {"suite": "codec_proxy", "condition": "proxy_mdct_32k", "RPA": 0.8},
        {"suite": "codec", "condition": "libopus_16k", "skipped": "ffmpeg unavailable"},
    ]
    s = summarize({"codec_bandwidth": rows})["codec_bandwidth"]
    assert s["rows"] == 3 and s["skipped"] == 1
    assert s["skipped_conditions"] == ["libopus_16k"]
    assert set(s["families"]) == {"baseline", "bandwidth", "codec_proxy"}
    assert s["families"]["codec_proxy"]["mean_RPA"] == pytest.approx(0.8)
    assert s["mean_RPA"] == pytest.approx((1.0 + 0.9 + 0.8) / 3)
