#!/usr/bin/env python
"""Training entry point: ``python train.py --config_path ./Configs/config.yml``
(the reference's shell contract, its train.py:45-47)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pitchextractor_tpu.cli import main

if __name__ == "__main__":
    main()
