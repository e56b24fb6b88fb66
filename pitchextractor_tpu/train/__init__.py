from .losses import smooth_l1_loss, bce_with_logits_loss
from .optim import build_optimizer, onecycle_schedule, MultiOptimizer, build_multi_optimizer
from .trainer import Trainer, TrainState

__all__ = [
    "smooth_l1_loss",
    "bce_with_logits_loss",
    "build_optimizer",
    "onecycle_schedule",
    "MultiOptimizer",
    "build_multi_optimizer",
    "Trainer",
    "TrainState",
]
