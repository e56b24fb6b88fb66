#!/usr/bin/env python
"""Bulk F0 label generation — checkout wrapper for ``pitchextractor-label``
(see pitchextractor_tpu/labels/cli.py for the implementation and the
reference warm-up loop it replaces, reference train.py:127-133).

Usage:
  python tools/precompute_labels.py --list Data/train_list.txt \
      --config ./Configs/config.yml [--batch_size 64] [--force]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pitchextractor_tpu.labels.cli import main, precompute  # noqa: F401  (re-export)

if __name__ == "__main__":
    main()
