from .dataset import MelDataset, DEFAULT_MEL_PARAMS
from .collate import Collater
from .loader import build_dataloader, DataLoader

__all__ = ["MelDataset", "DEFAULT_MEL_PARAMS", "Collater", "build_dataloader", "DataLoader"]
