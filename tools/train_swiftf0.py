#!/usr/bin/env python
"""Bootstrap SwiftF0-style labeler weights from synthetic data.

Usage:
  python tools/train_swiftf0.py --steps 3000 --output weights/swiftf0.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click


@click.command()
@click.option("--steps", default=3000, type=int)
@click.option("--frames_per_batch", default=512, type=int)
@click.option("--lr", default=3e-4, type=float)
@click.option("--seed", default=0, type=int)
@click.option("--arch", default="v2", type=click.Choice(["v1", "v2"]))
@click.option("--output", required=True, type=str)
def main(steps, frames_per_batch, lr, seed, arch, output):
    from pitchextractor_tpu.labels.swiftf0_train import train_swiftf0

    os.makedirs(os.path.dirname(os.path.abspath(output)), exist_ok=True)
    train_swiftf0(
        steps=steps,
        frames_per_batch=frames_per_batch,
        learning_rate=lr,
        seed=seed,
        output_path=output,
        arch=arch,
    )
    print(f"saved SwiftF0 weights to {output}")


if __name__ == "__main__":
    main()
