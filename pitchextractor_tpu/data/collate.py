"""Batch collation to fixed XLA-friendly shapes.

Mirrors the reference ``Collater`` (meldataset.py:790-826): zero-pad each
``(mel, f0, silence)`` to 192 frames and stack into
``(B, 1, n_mels, 192), (B, 192), (B, 192)`` float32 — the exact batch
contract consumed by the training step.  The reference's dead random-slice
branch (meldataset.py:818-823, mutates an undefined variable and can never
run since min==max==192) is intentionally omitted (SURVEY.md quirk list).

Fixed shapes are a hard requirement on TPU: every batch compiles to the same
XLA program (SURVEY.md §7 hard-part #4).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


class Collater:
    def __init__(self, return_wave: bool = False, max_mel_length: int = 192) -> None:
        self.return_wave = return_wave
        self.min_mel_length = max_mel_length
        self.max_mel_length = max_mel_length

    def __call__(self, batch: List[Tuple[np.ndarray, np.ndarray, np.ndarray]]):
        batch_size = len(batch)
        if batch[0][0].ndim == 1:
            # on-device front-end mode: items are fixed-length raw waveforms
            waves = np.stack([item[0] for item in batch]).astype(np.float32)
            f0s = np.stack([item[1] for item in batch]).astype(np.float32)
            sils = np.stack([item[2] for item in batch]).astype(np.float32)
            return waves, f0s, sils
        nmels = batch[0][0].shape[0]
        mels = np.zeros((batch_size, nmels, self.max_mel_length), dtype=np.float32)
        f0s = np.zeros((batch_size, self.max_mel_length), dtype=np.float32)
        is_silences = np.zeros((batch_size, self.max_mel_length), dtype=np.float32)
        for bid, (mel, f0, is_silence) in enumerate(batch):
            mel_size = min(mel.shape[1], self.max_mel_length)
            mels[bid, :, :mel_size] = mel[:, :mel_size]
            f0s[bid, :mel_size] = f0[:mel_size]
            is_silences[bid, :mel_size] = is_silence[:mel_size]
        mels = mels[:, None, :, :]  # (B, 1, n_mels, T)
        return mels, f0s, is_silences
