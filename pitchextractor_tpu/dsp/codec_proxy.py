"""In-tree lossy-codec degradation proxies for the codec-torture suite.

The reference's codec robustness evaluation shells out to ffmpeg for real
opus/mp3/aac encode/decode round trips (reference
Utils/codec_and_bandwidth_torture.ipynb cells 4 and 9,
``_ffmpeg_encode_decode``).  This build image has no ffmpeg, so rounds 1-2
silently skipped every real-codec row.  This module provides deterministic,
dependency-free *proxies* for the same degradation families so the codec
dimension actually executes everywhere:

- ``mulaw_roundtrip`` / ``alaw_roundtrip`` — G.711-style companded
  quantization (the telephony 8-bit codecs; μ=255 / A=87.6 laws).
- ``mdct_codec_roundtrip`` — a transform codec skeleton shared by
  opus(CELT)/mp3/aac: 50%-overlapped sine-windowed MDCT, per-band
  energy-driven bit allocation under a bitrate-proportional budget
  (water-filling over log-spaced bands), uniform mid-tread quantization of
  the band coefficients, zeroed bands where the budget runs out, inverse
  MDCT with overlap-add.  Low bitrates produce the characteristic
  band-limiting + quantization noise of real low-bitrate coding.

These are degradation *models*, not bit-exact codecs: suite rows produced
through them are tagged ``codec_proxy`` and reported separately from
real-ffmpeg ``codec`` rows (eval/suites.py), and RESULTS quotes label them
"proxy".  When ffmpeg is present the real rows still run and take
precedence in reporting.

Everything here is host-side numpy — codec simulation happens during
stimulus preparation, inference on the degraded audio stays on device.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


# ---------------------------------------------------------------------------
# Companding proxies (G.711 μ-law / A-law)
# ---------------------------------------------------------------------------

def mulaw_roundtrip(audio: np.ndarray, bits: int = 8, mu: float = 255.0) -> np.ndarray:
    """μ-law compand -> uniform ``bits``-bit quantize -> expand.

    G.711 μ-law at 8 bits is the classic telephony codec; fewer bits model
    harsher channels.  Deterministic, length-preserving.
    """
    x = np.clip(np.asarray(audio, dtype=np.float64), -1.0, 1.0)
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    # mid-tread sign+magnitude quantizer (G.711 layout): zero is a level
    half = float(2 ** (int(bits) - 1) - 1)
    yq = np.round(y * half) / half
    out = np.sign(yq) * (np.expm1(np.abs(yq) * np.log1p(mu))) / mu
    return out.astype(np.float32)


def alaw_roundtrip(audio: np.ndarray, bits: int = 8, A: float = 87.6) -> np.ndarray:
    """A-law compand -> uniform ``bits``-bit quantize -> expand (G.711 A-law)."""
    x = np.clip(np.asarray(audio, dtype=np.float64), -1.0, 1.0)
    ax = np.abs(x)
    denom = 1.0 + np.log(A)
    y = np.sign(x) * np.where(
        ax < 1.0 / A, A * ax / denom, (1.0 + np.log(np.maximum(A * ax, 1e-300))) / denom
    )
    half = float(2 ** (int(bits) - 1) - 1)
    yq = np.round(y * half) / half
    ay = np.abs(yq)
    out = np.sign(yq) * np.where(
        ay < 1.0 / denom, ay * denom / A, np.exp(ay * denom - 1.0) / A
    )
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# MDCT transform-codec proxy
# ---------------------------------------------------------------------------

def _mdct_matrix(n: int) -> np.ndarray:
    """(n, 2n) MDCT analysis matrix: X_k = sum_n x_n cos[pi/N (n + 1/2 + N/2)(k + 1/2)]."""
    k = np.arange(n, dtype=np.float64)[:, None]
    t = np.arange(2 * n, dtype=np.float64)[None, :]
    return np.cos(np.pi / n * (t + 0.5 + n / 2.0) * (k + 0.5))


def _sine_window(n: int) -> np.ndarray:
    """Princen-Bradley-compliant sine window over a 2n block."""
    t = np.arange(2 * n, dtype=np.float64)
    return np.sin(np.pi / (2.0 * n) * (t + 0.5))


def _band_edges(n: int, bands: int) -> np.ndarray:
    """Log-spaced band edges over n MDCT bins (coarse Bark-like spacing)."""
    edges = np.unique(
        np.round(np.geomspace(1.0, float(n), num=bands + 1)).astype(int)
    )
    edges[0] = 0
    edges[-1] = n
    return edges


def _allocate_bits(
    band_energy: np.ndarray, band_sizes: np.ndarray, budget_bits: float, max_bits: float = 12.0
) -> np.ndarray:
    """Water-filling bit allocation: b_i = clip(0.5*log2(E_i) - lam, 0, max)
    with sum(b_i * size_i) <= budget, lam found by bisection per frame.

    band_energy: (frames, bands) mean power per coefficient.
    Returns (frames, bands) fractional bits per coefficient.
    """
    log_e = 0.5 * np.log2(np.maximum(band_energy, 1e-30))  # (F, B)
    sizes = band_sizes[None, :].astype(np.float64)

    lo = log_e.min(axis=1) - max_bits - 1.0  # lam low -> everything maxed
    hi = log_e.max(axis=1) + 1.0  # lam high -> zero bits
    for _ in range(40):
        lam = 0.5 * (lo + hi)
        bits = np.clip(log_e - lam[:, None], 0.0, max_bits)
        used = (bits * sizes).sum(axis=1)
        over = used > budget_bits
        lo = np.where(over, lam, lo)
        hi = np.where(over, hi, lam)
    lam = hi
    return np.clip(log_e - lam[:, None], 0.0, max_bits)


def mdct_codec_roundtrip(
    audio: np.ndarray,
    sr: int,
    bitrate_kbps: float,
    n: int = 512,
    bands: int = 26,
    side_info_fraction: float = 0.2,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Bitrate-proportional MDCT quantization (opus/mp3/aac degradation proxy).

    Frames the signal into 50%-overlapped 2n-sample sine-windowed blocks,
    takes the MDCT, spends ``bitrate_kbps`` (less a side-info fraction real
    codecs lose to headers/envelopes) on per-band uniform quantization with
    water-filled allocation, and resynthesizes by IMDCT overlap-add.  With no
    quantization the transform round trip is perfect-reconstruction
    (Princen-Bradley; test-gated), so all degradation comes from the bit
    budget.  ``rng`` dithers the quantizer (off by default: deterministic).
    """
    x = np.asarray(audio, dtype=np.float64).reshape(-1)
    n = int(n)
    total = len(x)
    # offset by one full hop so every signal sample is covered by TWO
    # overlapping blocks (TDAC aliasing cancels only where both halves of
    # the 50% overlap exist), plus trailing flush blocks
    frames = int(np.ceil(total / n)) + 2
    padded = np.zeros((frames + 1) * n, dtype=np.float64)
    padded[n : n + total] = x

    C = _mdct_matrix(n)  # (n, 2n)
    w = _sine_window(n)  # (2n,)

    # analysis: (frames, 2n) windowed blocks -> (frames, n) coefficients
    idx = np.arange(2 * n)[None, :] + (np.arange(frames) * n)[:, None]
    blocks = padded[np.minimum(idx, len(padded) - 1)] * w[None, :]
    X = blocks @ C.T  # (frames, n)

    # --- bit allocation under the bitrate budget -------------------------
    edges = _band_edges(n, bands)
    sizes = np.diff(edges)
    nb = len(sizes)
    band_of_bin = np.repeat(np.arange(nb), sizes)
    # mean power per coefficient per band
    sq = X * X
    band_energy = np.stack(
        [sq[:, edges[b] : edges[b + 1]].mean(axis=1) for b in range(nb)], axis=1
    )
    frame_seconds = n / float(sr)
    budget = max(bitrate_kbps, 0.0) * 1000.0 * frame_seconds * (1.0 - side_info_fraction)
    bits = _allocate_bits(band_energy, sizes, budget)  # (frames, nb)

    # --- uniform mid-tread quantization per band -------------------------
    # step sized so a b-bit quantizer spans ~4 sigma of the band's coeffs
    sigma = np.sqrt(np.maximum(band_energy, 1e-30))  # (frames, nb)
    nlevels = np.exp2(bits)  # (frames, nb)
    step = 8.0 * sigma / np.maximum(nlevels, 1.0)
    step_bins = step[:, band_of_bin]
    audible = (bits[:, band_of_bin] >= 0.5).astype(np.float64)  # <0.5 bit: band zeroed
    q = np.round(X / step_bins)
    if rng is not None:  # optional TPDF-ish dither for decorrelated noise
        q = np.round(X / step_bins + rng.uniform(-0.5, 0.5, size=X.shape))
    Xq = q * step_bins * audible

    # --- synthesis: IMDCT + overlap-add ----------------------------------
    y_blocks = (Xq @ C) * (2.0 / n) * w[None, :]  # (frames, 2n)
    out = np.zeros_like(padded)
    for f in range(frames):
        out[f * n : f * n + 2 * n] += y_blocks[f]
    return out[n : n + total].astype(np.float32)


#: proxy registry used by the codec suite: name -> callable(audio, sr, param)
PROXY_CODECS = {
    "mulaw": lambda audio, sr, bits: mulaw_roundtrip(audio, bits=int(bits)),
    "alaw": lambda audio, sr, bits: alaw_roundtrip(audio, bits=int(bits)),
    "mdct": lambda audio, sr, kbps: mdct_codec_roundtrip(audio, sr, float(kbps)),
}
