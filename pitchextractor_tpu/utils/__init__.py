from .logging import setup_logging
from .summary import SummaryWriter

__all__ = ["setup_logging", "SummaryWriter"]
