from .jdc import JDCNet, activation_dtype_from
from .sequence import SequenceModel, SinusoidalPositionalEncoding, BiLSTM, TransformerEncoder

__all__ = [
    "JDCNet",
    "activation_dtype_from",
    "SequenceModel",
    "SinusoidalPositionalEncoding",
    "BiLSTM",
    "TransformerEncoder",
]
