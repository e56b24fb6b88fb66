"""Bulk F0-labeling CLI — batch utterances onto the accelerator and write the
standard ``_f0{chain}.npy``/``.json`` caches.

Installed as ``pitchextractor-label``; ``tools/precompute_labels.py`` wraps
the same entry point for checkout use.

Replaces the reference's cache warm-up pass (reference train.py:127-133),
where every file is labeled one at a time inside CPU DataLoader workers:
files are bucketed by padded length and labeled in dense batches through the
TPU-resident tracker (one jitted dispatch per bucket shape), then each
contour is trimmed to the file's true frame count before caching.
"""

from __future__ import annotations

import json
import os

import click


def precompute(
    list_path: str,
    config_path: str = "./Configs/config.yml",
    batch_size: int = 64,
    bucket_seconds: float = 1.0,
    force: bool = False,
    verbose: bool = True,
    transfer_dtype: str = "int16",
) -> dict:
    from pitchextractor_tpu import config as config_lib
    from pitchextractor_tpu.data.dataset import MelDataset
    from pitchextractor_tpu.labels.bulk import precompute_for_dataset

    config = {}
    if os.path.isfile(config_path):
        config = config_lib.resolve(config_lib.load_config(config_path))
    dataset_params = config.get("dataset_params", {})

    with open(list_path, "r", encoding="utf-8") as fh:
        lines = fh.readlines()

    dataset = MelDataset(
        lines,
        mel_params=dataset_params.get("mel_params"),
        f0_params=dataset_params.get("f0_params"),
        verbose=False,
    )
    return precompute_for_dataset(
        dataset,
        batch_size=batch_size,
        bucket_seconds=bucket_seconds,
        force=force,
        verbose=verbose,
        transfer_dtype=transfer_dtype,
    )


@click.command()
@click.option("--list", "list_path", required=True, type=str)
@click.option("--config", "config_path", default="./Configs/config.yml", type=str)
@click.option("--batch_size", default=64, type=int)
@click.option("--bucket_seconds", default=1.0, type=float)
@click.option("--force", is_flag=True, default=False)
@click.option(
    "--transfer_dtype",
    default="int16",
    type=click.Choice(["int16", "float32"]),
    help="wire dtype for the pipelined wave upload (int16 halves the bytes; "
    "float32 gives byte-identical caches vs the serial path)",
)
def main(list_path, config_path, batch_size, bucket_seconds, force, transfer_dtype):
    stats = precompute(
        list_path, config_path, batch_size, bucket_seconds, force,
        transfer_dtype=transfer_dtype,
    )
    print(json.dumps(stats, default=str))


if __name__ == "__main__":
    main()
