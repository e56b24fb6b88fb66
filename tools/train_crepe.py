#!/usr/bin/env python
"""Bootstrap CREPE labeler weights from synthetic data with exact F0.

Usage:
  python tools/train_crepe.py --capacity tiny --steps 4000 \
      --output weights/crepe_tiny.npz

Then enable the backend in the config:
  backends.crepe: {type: crepe, enabled: true,
                   config: {model: tiny, weights_path: weights/crepe_tiny.npz}}
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click


@click.command()
@click.option("--capacity", default="tiny", type=click.Choice(["tiny", "small", "medium", "large", "full"]))
@click.option("--steps", default=4000, type=int)
@click.option("--batch_size", default=256, type=int)
@click.option("--lr", default=2e-4, type=float)
@click.option("--seed", default=0, type=int)
@click.option("--output", required=True, type=str)
def main(capacity, steps, batch_size, lr, seed, output):
    from pitchextractor_tpu.labels.crepe_train import train_crepe

    os.makedirs(os.path.dirname(os.path.abspath(output)), exist_ok=True)
    train_crepe(
        capacity=capacity,
        steps=steps,
        batch_size=batch_size,
        learning_rate=lr,
        seed=seed,
        output_path=output,
    )
    print(f"saved {capacity} CREPE weights to {output}")


if __name__ == "__main__":
    main()
