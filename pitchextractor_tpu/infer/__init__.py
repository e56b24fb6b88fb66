from .predict import (
    F0Predictor,
    load_model,
    latest_checkpoint,
    octave_correct,
    octave_decode_viterbi,
)

__all__ = [
    "F0Predictor",
    "load_model",
    "latest_checkpoint",
    "octave_correct",
    "octave_decode_viterbi",
]
