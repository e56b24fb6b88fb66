from .mel import (
    mel_spectrogram_gemm,
    MelSpectrogram,
    hann_window,
    mel_filterbank,
    mel_spectrogram_jax,
    mel_spectrogram_np,
    log_normalize,
    log_normalize_np,
    MEL_LOG_OFFSET,
    MEL_MEAN,
    MEL_STD,
)
from .stft import stft_np, stft_jax, frame_count
from .resample import resample_np, resample_jax

__all__ = [
    "MelSpectrogram",
    "hann_window",
    "mel_filterbank",
    "mel_spectrogram_jax",
    "mel_spectrogram_gemm",
    "mel_spectrogram_np",
    "log_normalize",
    "log_normalize_np",
    "MEL_LOG_OFFSET",
    "MEL_MEAN",
    "MEL_STD",
    "stft_np",
    "stft_jax",
    "frame_count",
    "resample_np",
    "resample_jax",
]
