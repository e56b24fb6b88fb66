"""Logging setup: stdout + ``train.log`` in the run dir
(reference train.py:20-26, 56-59)."""

from __future__ import annotations

import logging
import os
from logging import FileHandler, StreamHandler


def setup_logging(log_dir: str, name: str = "pitchextractor_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    if not any(isinstance(h, StreamHandler) and not isinstance(h, FileHandler) for h in logger.handlers):
        handler = StreamHandler()
        # console at INFO (backend debug chatter stays in train.log)
        handler.setLevel(logging.INFO)
        logger.addHandler(handler)
    os.makedirs(log_dir, exist_ok=True)
    log_path = os.path.join(log_dir, "train.log")
    if not any(
        isinstance(h, FileHandler) and getattr(h, "baseFilename", None) == os.path.abspath(log_path)
        for h in logger.handlers
    ):
        file_handler = FileHandler(log_path)
        file_handler.setLevel(logging.DEBUG)
        file_handler.setFormatter(logging.Formatter("%(levelname)s:%(asctime)s: %(message)s"))
        logger.addHandler(file_handler)
    return logger
