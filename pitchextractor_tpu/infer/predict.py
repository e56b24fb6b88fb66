"""Inference: one jitted wav -> F0 contour graph.

Re-designs the notebooks' host-side chunked ``predict_f0`` (reference
Utils/dynamic_pitch_behavior.ipynb cell 5; same in all six notebooks) as a
single XLA program: mel front-end -> overlapped 192-frame chunk extraction ->
one *batched* model apply over all chunks -> stitch.  The reference loops
chunks through the model one at a time on the host; batching them is the
TPU-idiomatic shape (the chunk axis becomes a batch axis on the MXU).

Stitching semantics: the reference concatenates ``f0_chunk[:end-start]`` for
``start in range(0, T, 144)`` — for T > 192 successive chunks *overlap* by 48
frames, so its output is longer than T and drifts out of frame alignment
after the first chunk (a latent quirk of the notebook implementation).  The
default here center-splits each overlap: chunk *i*>0 contributes frames
``[overlap/2, step + overlap/2)`` (output length == T, every frame aligned),
so every kept frame has at least ``overlap/2`` frames of context on its weak
side — keep-FIRST-stride stitching gave each interior chunk's leading frames
zero left context, a measured 1.3-1.6x error inflation at chunk heads on
fast vibrato (results/round2/vibrato_diag_f100.csv, chunk_head_err column).
``legacy_concat=True`` reproduces the reference byte-for-byte for parity
evaluations.
"""

from __future__ import annotations

import functools
import glob
import json
import logging
import os
import re
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..dsp.mel import MEL_LOG_OFFSET, mel_spectrogram_jax
from ..dsp.resample import resample_np
from ..models import JDCNet
from ..train.checkpoint import restore_raw, tolerant_merge
from flax import serialization


@functools.partial(
    jax.jit,
    static_argnames=(
        "apply_fn",
        "sample_rate",
        "n_fft",
        "win_length",
        "hop_length",
        "n_mels",
        "chunk_size",
        "overlap",
    ),
)
def _predict_graph(
    apply_fn,
    variables,
    audio: jnp.ndarray,
    sample_rate: int,
    n_fft: int,
    win_length: int,
    hop_length: int,
    n_mels: int,
    chunk_size: int,
    overlap: int,
    mean: float,
    std: float,
):
    """(samples,) -> per-chunk (n_chunks, chunk, ...) predictions + frame count."""
    mel = mel_spectrogram_jax(
        audio[None, :], sample_rate, n_fft, win_length, hop_length, n_mels
    )[0]
    mel = (jnp.log(MEL_LOG_OFFSET + mel) - mean) / std  # (n_mels, T)
    total_frames = mel.shape[1]
    step = max(chunk_size - overlap, 1)
    n_chunks = max(1, -(-total_frames // step))  # ceil

    # pad so every chunk window is fully in-bounds, then gather all chunks
    padded = jnp.pad(mel, ((0, 0), (0, (n_chunks - 1) * step + chunk_size - total_frames)))
    starts = jnp.arange(n_chunks) * step
    idx = starts[:, None] + jnp.arange(chunk_size)[None, :]  # (n_chunks, chunk)
    chunks = padded.T[idx]  # (n_chunks, chunk, n_mels)
    x = chunks[..., None]  # NHWC (n_chunks, chunk, n_mels, 1)

    f0_chunks, voicing_chunks = apply_fn(variables, x, train=False)
    f0_chunks = jnp.squeeze(f0_chunks, axis=-1) if f0_chunks.shape[-1] == 1 else f0_chunks
    return f0_chunks, voicing_chunks, total_frames


@functools.partial(
    jax.jit,
    static_argnames=(
        "apply_fn",
        "sample_rate",
        "n_fft",
        "win_length",
        "hop_length",
        "n_mels",
        "chunk_size",
        "overlap",
    ),
)
def _predict_graph_batch(
    apply_fn,
    variables,
    audio: jnp.ndarray,  # (N, S) equal padded lengths
    sample_rate: int,
    n_fft: int,
    win_length: int,
    hop_length: int,
    n_mels: int,
    chunk_size: int,
    overlap: int,
    mean: float,
    std: float,
):
    """Batched wav -> per-chunk predictions: all utterances' chunks run
    through the model in ONE apply (N·n_chunks becomes the batch axis)."""
    mel = mel_spectrogram_jax(audio, sample_rate, n_fft, win_length, hop_length, n_mels)
    mel = (jnp.log(MEL_LOG_OFFSET + mel) - mean) / std  # (N, M, T)
    N, M, total_frames = mel.shape
    step = max(chunk_size - overlap, 1)
    n_chunks = max(1, -(-total_frames // step))

    padded = jnp.pad(mel, ((0, 0), (0, 0), (0, (n_chunks - 1) * step + chunk_size - total_frames)))
    starts = jnp.arange(n_chunks) * step
    idx = starts[:, None] + jnp.arange(chunk_size)[None, :]  # (n_chunks, chunk)
    chunks = jnp.swapaxes(padded, 1, 2)[:, idx]  # (N, n_chunks, chunk, M)
    x = chunks.reshape((N * n_chunks, chunk_size, M))[..., None]

    f0_chunks, voicing_chunks = apply_fn(variables, x, train=False)
    f0_chunks = jnp.squeeze(f0_chunks, axis=-1) if f0_chunks.shape[-1] == 1 else f0_chunks
    return (
        f0_chunks.reshape((N, n_chunks, chunk_size) + f0_chunks.shape[2:]),
        voicing_chunks.reshape((N, n_chunks, chunk_size)),
        total_frames,
    )


class F0Predictor:
    """Callable wav -> (f0_hz, voicing_logit) bound to one model + mel config."""

    def __init__(
        self,
        model: JDCNet,
        variables: Dict[str, Any],
        mel_params: Optional[Dict] = None,
        mean: float = -4.0,
        std: float = 4.0,
        chunk_size: int = 192,
        overlap: int = 48,
        voicing_threshold_hz: float = 10.0,
        bucket_seconds: float = 1.0,
        octave_correction: Union[bool, str] = False,
    ) -> None:
        from ..config import normalize_mel_params

        self.model = model
        self.variables = variables
        self.mel_params = normalize_mel_params(mel_params)
        self.mean = float(mean)
        self.std = float(std)
        self.chunk_size = int(chunk_size)
        self.overlap = int(overlap)
        self.voicing_threshold_hz = float(voicing_threshold_hz)
        # arbitrary input lengths are zero-padded to this bucket so the
        # jitted graph compiles for a bounded set of shapes; the contour is
        # trimmed back to the true frame count
        self.bucket_seconds = float(bucket_seconds)
        # False (default): raw model output (reference-notebook parity).
        # True: median snap of isolated flips (octave_correct).
        # "viterbi": continuity decode that also fixes sustained flip runs
        # (octave_decode_viterbi).
        self.octave_correction = octave_correction

    @property
    def sample_rate(self) -> int:
        return self.mel_params["sample_rate"]

    @property
    def frame_period_ms(self) -> float:
        return self.mel_params["hop_length"] * 1000.0 / self.sample_rate

    def _run(self, audio: np.ndarray, sr: Optional[int]):
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        if sr is not None and sr != self.sample_rate:
            audio = resample_np(audio, sr, self.sample_rate)
        hop = self.mel_params["hop_length"]
        true_frames = 1 + len(audio) // hop
        if self.bucket_seconds > 0:
            from ..labels.backends import bucket_length

            padded_len = bucket_length(len(audio), self.sample_rate, self.bucket_seconds)
            if padded_len > len(audio):
                audio = np.pad(audio, (0, padded_len - len(audio)))
        f0_chunks, voicing_chunks, total = _predict_graph(
            self.model.apply,
            self.variables,
            jnp.asarray(audio),
            self.sample_rate,
            self.mel_params["n_fft"],
            self.mel_params["win_length"],
            self.mel_params["hop_length"],
            self.mel_params["n_mels"],
            self.chunk_size,
            self.overlap,
            self.mean,
            self.std,
        )
        return np.asarray(f0_chunks), np.asarray(voicing_chunks), min(int(total), true_frames)

    def predict_f0(
        self,
        audio: np.ndarray,
        sr: Optional[int] = None,
        legacy_concat: bool = False,
    ) -> np.ndarray:
        """wav -> F0 contour in Hz (frame-aligned; see module docstring)."""
        f0_chunks, _, total = self._run(audio, sr)
        return self._stitch(f0_chunks, total, legacy_concat)

    def predict(
        self, audio: np.ndarray, sr: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """wav -> (f0_hz, voiced_mask) with the eval-suite voicing rule
        (prediction > voicing_threshold_hz; notebooks CONFIG)."""
        f0_chunks, _, total = self._run(audio, sr)
        f0 = self._stitch(f0_chunks, total, False)
        return f0, f0 > self.voicing_threshold_hz

    def predict_f0_batch(self, audios, sr: Optional[int] = None) -> list:
        """Batched inference over many utterances (one device dispatch per
        padded-length bucket; every utterance's chunks share one model apply).

        Args:
          audios: iterable of 1-D waveforms (may have different lengths).
        Returns: list of per-utterance F0 contours, frame-aligned.
        """
        from ..labels.backends import bucket_length

        audios = [np.asarray(a, dtype=np.float32).reshape(-1) for a in audios]
        if sr is not None and sr != self.sample_rate:
            audios = [resample_np(a, sr, self.sample_rate) for a in audios]
        hop = self.mel_params["hop_length"]

        # group by padded bucket so each bucket is a single compiled shape
        buckets: Dict[int, list] = {}
        for i, a in enumerate(audios):
            padded = bucket_length(len(a), self.sample_rate, max(self.bucket_seconds, 1e-6))
            buckets.setdefault(padded, []).append(i)

        results: list = [None] * len(audios)
        for padded, indices in sorted(buckets.items()):
            batch = np.zeros((len(indices), padded), dtype=np.float32)
            for row, i in enumerate(indices):
                batch[row, : len(audios[i])] = audios[i]
            f0_chunks, _, total = _predict_graph_batch(
                self.model.apply,
                self.variables,
                jnp.asarray(batch),
                self.sample_rate,
                self.mel_params["n_fft"],
                self.mel_params["win_length"],
                self.mel_params["hop_length"],
                self.mel_params["n_mels"],
                self.chunk_size,
                self.overlap,
                self.mean,
                self.std,
            )
            f0_chunks = np.asarray(f0_chunks)
            for row, i in enumerate(indices):
                true_frames = 1 + len(audios[i]) // hop
                results[i] = self._stitch(f0_chunks[row], min(int(total), true_frames), False)
        return results

    def _stitch(self, chunks: np.ndarray, total_frames: int, legacy_concat: bool) -> np.ndarray:
        step = max(self.chunk_size - self.overlap, 1)
        if legacy_concat:
            # reference notebook concatenation (overlapping, len >= T)
            preds = []
            for i, start in enumerate(range(0, total_frames, step)):
                end = min(start + self.chunk_size, total_frames)
                preds.append(chunks[i][: end - start])
            return np.concatenate(preds) if preds else np.zeros((0,), np.float32)
        # Center-split stitching: consecutive chunks overlap by ``overlap``
        # frames; hand the first half of each overlap to the earlier chunk
        # (which has full left context there) and the second half to the
        # later one.  Kept ranges tile [0, total_frames) exactly.
        half = self.overlap // 2
        out = np.zeros((total_frames,), dtype=np.float32)
        starts = list(range(0, total_frames, step))
        for i, start in enumerate(starts):
            lo = 0 if i == 0 else half
            hi = self.chunk_size if i == len(starts) - 1 else step + half
            end = min(start + hi, total_frames)
            if start + lo >= end:
                continue
            out[start + lo : end] = chunks[i][lo : end - start]
        if self.octave_correction:
            if str(self.octave_correction).lower() == "viterbi":
                out = octave_decode_viterbi(out, self.voicing_threshold_hz)
            else:
                out = octave_correct(out, self.voicing_threshold_hz)
        return out


def octave_correct(
    f0: np.ndarray,
    voicing_threshold_hz: float = 10.0,
    window: int = 9,
    threshold_octaves: float = 0.6,
) -> np.ndarray:
    """Snap isolated octave flips back onto the local contour.

    Classical trackers decode F0 with continuity constraints; the JDC
    regression head has none, and on dense-harmonic vowels ~4% of voiced
    frames land an exact octave off (RESULTS.md real-audio suite).  For
    each voiced frame, compare log2(f0) to the running median over the
    ``window`` nearest voiced frames and divide out the rounded octave
    offset when it exceeds ``threshold_octaves``.  The margin is sized so
    legitimate fast contours survive: the steepest eval glide (~7.6 oct/s)
    moves ~0.43 octaves across the half-window, under the 0.6 threshold.
    Opt-in (``F0Predictor(octave_correction=True)``) — default off to keep
    raw-model parity with the reference notebooks.
    """
    f0 = np.asarray(f0, dtype=np.float32)
    voiced_idx = np.nonzero(f0 > voicing_threshold_hz)[0]
    if voiced_idx.size < window:
        return f0
    logf = np.log2(f0[voiced_idx])
    half = window // 2
    padded = np.pad(logf, (half, half), mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(padded, window)
    med = np.median(windows, axis=-1)
    shift = np.round(logf - med)
    shift[np.abs(logf - med) <= threshold_octaves] = 0.0
    out = f0.copy()
    out[voiced_idx] = f0[voiced_idx] / (2.0**shift)
    return out


def octave_decode_viterbi(
    f0: np.ndarray,
    voicing_threshold_hz: float = 10.0,
    octave_prior: float = 0.1,
    max_shift: int = 2,
    gap_relax_frames: float = 3.0,
) -> np.ndarray:
    """Continuity decode of octave errors, including sustained flip runs.

    ``octave_correct`` (running-median snap) only fixes flips shorter than
    half its window; the real-audio suite showed the remaining model-vs-
    oracle octave disagreements are sustained 2-21-frame runs (RESULTS.md
    round-2 stage k).  This decode chooses a per-voiced-frame octave shift
    k in [-max_shift, max_shift] by minimizing

        sum_t octave_prior * |k_t|                      (stay-raw prior)
      + sum_t w_t * |log2(f0_t) - k_t - (log2(f0_{t-1}) - k_{t-1})|

    with the transition weight ``w_t = 1/(1 + gap/gap_relax_frames)``
    relaxed across unvoiced gaps.  The economics pick exactly the right
    fixes: an erroneous L-frame flip run costs ~2 transition units if kept
    raw but only ``octave_prior * L`` if corrected, so runs up to
    ~2/octave_prior (= 20) frames snap back, while a *genuine* sustained
    octave change (a singer landing an octave up and staying) keeps its raw
    reading once the run is long enough.  This is the same cost structure
    Praat's path finder uses for octave jumps (labels/praat_ac.py), applied
    post-hoc to the regression head's contour.  Opt-in via
    ``F0Predictor(octave_correction="viterbi")``; default stays off for
    raw-model parity with the reference notebooks.
    """
    f0 = np.asarray(f0, dtype=np.float32)
    voiced_idx = np.nonzero(f0 > voicing_threshold_hz)[0]
    n = voiced_idx.size
    if n < 2:
        return f0
    logf = np.log2(f0[voiced_idx].astype(np.float64))
    shifts = np.arange(-int(max_shift), int(max_shift) + 1, dtype=np.float64)
    k_states = shifts.size

    # transition weights: adjacent voiced frames get weight 1, frames
    # separated by an unvoiced gap get a relaxed weight
    gaps = np.diff(voiced_idx).astype(np.float64) - 1.0
    weights = 1.0 / (1.0 + gaps / float(gap_relax_frames))

    emission = octave_prior * np.abs(shifts)  # same every frame
    cost = emission.copy()  # [k_states]
    back = np.zeros((n, k_states), dtype=np.int8)
    corrected_prev = logf[0] - shifts
    for t in range(1, n):
        corrected_t = logf[t] - shifts
        # pairwise |corrected_t[j] - corrected_prev[i]| -> [i, j]
        trans = weights[t - 1] * np.abs(corrected_t[None, :] - corrected_prev[:, None])
        total = cost[:, None] + trans
        best_i = np.argmin(total, axis=0)
        cost = total[best_i, np.arange(k_states)] + emission
        back[t] = best_i
        corrected_prev = corrected_t

    path = np.empty(n, dtype=np.int64)
    path[-1] = int(np.argmin(cost))
    for t in range(n - 1, 0, -1):
        path[t - 1] = back[t, path[t]]

    out = f0.copy()
    out[voiced_idx] = (f0[voiced_idx].astype(np.float64) / (2.0 ** shifts[path])).astype(
        np.float32
    )
    return out


def latest_checkpoint(path: str) -> Optional[str]:
    """Newest checkpoint by trailing number then mtime (notebook
    ``_latest_checkpoint``)."""
    if not os.path.isdir(path):
        return None

    def sort_key(p: str):
        numbers = [int(m) for m in re.findall(r"\d+", os.path.splitext(os.path.basename(p))[0])]
        last = numbers[-1] if numbers else -1
        return last, os.path.getmtime(p)

    candidates = sorted(glob.glob(os.path.join(path, "*.ckpt")), key=sort_key)
    return candidates[-1] if candidates else None


def _shape_mismatches(template: Any, restored: Any, path: str = "") -> list:
    """Paths whose leaf shapes differ between two nested state dicts
    (keys missing from ``restored`` are not mismatches — tolerant_merge
    keeps the template leaf for those)."""
    if isinstance(template, dict):
        out = []
        src = restored if isinstance(restored, dict) else {}
        for key, tval in template.items():
            if str(key) in {str(k) for k in src}:
                sval = src.get(key, src.get(str(key)))
                out += _shape_mismatches(tval, sval, f"{path}/{key}")
        return out
    t_shape = tuple(getattr(template, "shape", np.shape(template)))
    s_shape = tuple(getattr(restored, "shape", np.shape(restored)))
    return [f"{path}: {s_shape} vs {t_shape}"] if s_shape != t_shape else []


def load_model(
    checkpoint_path: str,
    config: Optional[Dict] = None,
) -> Tuple[JDCNet, Dict[str, Any]]:
    """Rebuild a JDCNet from a checkpoint (+ YAML config), inferring
    ``num_class`` from the classifier kernel shape (notebook ``load_model``)."""
    raw = restore_raw(checkpoint_path)
    model_state = raw.get("model", raw)
    params = model_state.get("params", {})
    batch_stats = model_state.get("batch_stats", {})

    num_class = None
    classifier = params.get("classifier", {})
    kernel = classifier.get("kernel")
    if kernel is not None:
        num_class = int(np.asarray(kernel).shape[-1])

    model_params: Dict[str, Any] = {}
    if config:
        model_params = dict(config.get("model_params", {}) or {})
    meta_path = checkpoint_path + ".json"
    if os.path.isfile(meta_path):
        try:
            meta = json.load(open(meta_path))
            if isinstance(meta.get("model_params"), dict):
                merged = dict(meta["model_params"])
                merged.update({k: v for k, v in model_params.items() if k == "sequence_model"})
                model_params = {**meta["model_params"], **model_params}
        except (OSError, json.JSONDecodeError):
            pass

    if num_class is None:
        num_class = int(model_params.get("num_class", 1))

    # Inference deliberately ignores model_params.activation_dtype: the bf16
    # trunk is a *training* throughput knob; eval/labeling numerics stay f32
    # (checkpoint params are f32 either way, so this is always valid).
    model = JDCNet(
        num_class=num_class,
        sequence_model_config=model_params.get("sequence_model", {}) or {},
        # layout-only knob, checkpoint-identical either way (freq_pack.py)
        freq_pack=bool(model_params.get("freq_pack", False)),
    )
    dummy = jnp.zeros((1, 8, 80, 1), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), dummy, train=False)
    mismatched = _shape_mismatches(
        serialization.to_state_dict(template["params"]), params
    )
    if mismatched:
        logging.getLogger(__name__).warning(
            "load_model: %d parameter leaves differ in shape between the "
            "checkpoint and the rebuilt architecture (e.g. %s) — the "
            "tolerant merge will overlap-copy them, which usually means the "
            "sequence_model config does not match the checkpoint. Pass "
            "config={'model_params': ...} or use a checkpoint with a "
            "model_params sidecar.",
            len(mismatched),
            ", ".join(mismatched[:3]),
        )
    variables = {
        "params": serialization.from_state_dict(
            template["params"],
            tolerant_merge(serialization.to_state_dict(template["params"]), params),
        ),
        "batch_stats": serialization.from_state_dict(
            template.get("batch_stats", {}),
            tolerant_merge(
                serialization.to_state_dict(template.get("batch_stats", {})), batch_stats
            ),
        ),
    }
    return model, variables
