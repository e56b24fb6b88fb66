#!/usr/bin/env python
"""Robustness evaluation runner — the scripted replacement for the
reference's six Utils/*.ipynb notebooks.

Usage:
  python evaluate.py --checkpoint Checkpoint/epoch_00100.ckpt \
      --suites dynamic_pitch,noise --output_dir notebooks/artifacts

Without --checkpoint, the newest checkpoint under --checkpoint_dir is used
(the notebooks' auto-discovery behaviour).  Logic lives in
pitchextractor_tpu/eval/cli.py (installed as ``pitchextractor-eval``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pitchextractor_tpu.eval.cli import main

if __name__ == "__main__":
    main()
