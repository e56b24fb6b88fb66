from .jdc import JDCNet
from .sequence import SequenceModel, SinusoidalPositionalEncoding, BiLSTM, TransformerEncoder

__all__ = [
    "JDCNet",
    "SequenceModel",
    "SinusoidalPositionalEncoding",
    "BiLSTM",
    "TransformerEncoder",
]
