"""Training CLI (reference train.py:45-153).

Usage: ``python train.py --config_path ./Configs/config.yml`` — the same
shell contract as the reference (README.md:28-30 there).
"""

from __future__ import annotations

import os
import os.path as osp
import time

import click
import numpy as np

from . import config as config_lib
from .models import JDCNet
from .data import build_dataloader
from .train.optim import build_optimizer
from .train.trainer import Trainer
from .utils.logging import setup_logging
from .utils.summary import SummaryWriter


# distinctive exit code for the voluntary restart-on-RSS path so shell
# supervisors can distinguish it from crashes
RSS_EXIT_CODE = 42


def _rss_gb() -> float:
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def _total_ram_gb() -> float:
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    return float(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0  # unknown -> guard disabled


@click.command()
@click.option("-p", "--config_path", default="./Configs/config.yml", type=str)
@click.option("--max_steps", default=None, type=int, help="debug: stop after N epochs' worth of steps")
def main(config_path, max_steps):
    raise SystemExit(run(config_path, max_steps=max_steps))


def run(config_path: str, max_steps=None) -> int:
    from pitchextractor_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    raw = config_lib.load_config(config_path)
    config = config_lib.resolve(raw)
    log_dir = config["log_dir"]
    os.makedirs(log_dir, exist_ok=True)
    config_lib.archive_config(config_path, log_dir)

    writer = SummaryWriter(osp.join(log_dir, "tensorboard"))
    logger = setup_logging(log_dir)

    batch_size = config.get("batch_size", 32)
    epochs = config.get("epochs", 100)
    save_freq = config.get("save_freq", 10)
    num_workers = config.get("num_workers", 8)
    training_config = config.get("training", {})

    # on-device front-end: datasets emit raw waveform crops; the mel +
    # log-norm run inside the compiled training step (training section key
    # `on_device_frontend`, new in the TPU framework)
    if training_config.get("on_device_frontend", False):
        config["dataset_params"]["return_wave"] = True

    train_list, val_list = config_lib.get_data_path_list(
        config.get("train_data"), config.get("val_data")
    )

    train_dataloader = build_dataloader(
        train_list,
        batch_size=batch_size,
        num_workers=num_workers,
        dataset_config=config.get("dataset_params", {}),
    )
    val_dataloader = build_dataloader(
        val_list,
        batch_size=batch_size,
        validation=True,
        num_workers=max(num_workers // 2, 0),
        dataset_config=config.get("dataset_params", {}),
    )

    model_config = config.get("model_params", {})
    from .models import activation_dtype_from

    model = JDCNet(
        num_class=model_config.get("num_class", 1),  # 1 => F0 regression
        sequence_model_config=model_config.get("sequence_model", {}),
        dtype=activation_dtype_from(model_config.get("activation_dtype")),
        # lane-native packed trunk layout (models/freq_pack.py) — exact
        # same function and checkpoints, TPU memory-traffic optimization
        freq_pack=bool(model_config.get("freq_pack", False)),
    )

    scheduler_params = {
        "max_lr": float(config["optimizer_params"].get("lr", 5e-4)),
        "pct_start": float(config["optimizer_params"].get("pct_start", 0.0)),
        "epochs": epochs,
        "steps_per_epoch": max(len(train_dataloader), 1),
    }
    optimizer, schedule = build_optimizer(
        {"params": None, "optimizer_params": config["optimizer_params"], "scheduler_params": scheduler_params}
    )

    n_mels = config["dataset_params"]["mel_params"]["n_mels"]
    trainer = Trainer(
        model=model,
        optimizer=optimizer,
        scheduler=schedule,
        config=config,
        loss_config=config["loss_params"],
        train_dataloader=train_dataloader,
        val_dataloader=val_dataloader,
        logger_=logger,
        use_mixed_precision=training_config.get("mixed_precision", True),
        gradient_checkpointing=training_config.get("gradient_checkpointing", False),
        n_mels=n_mels,
        mel_params=config["dataset_params"]["mel_params"],
    )

    # auto-resume: if the run dir already holds epoch_*.ckpt files (a crashed
    # or pre-empted earlier attempt of the *same* run), restore the newest one
    # with full optimizer/step state and continue the epoch loop from there.
    # The reference has no notion of resume (train.py restarts from scratch);
    # long TPU runs need one.  ``pretrained_model`` applies only on the run's
    # FIRST launch: once the run dir holds its own checkpoints, a relaunch
    # (crash / RSS-guard rc=42 / babysitter restart) must resume them — not
    # warm-start from scratch again, which would silently discard the stage's
    # progress on every restart of a fine-tune run.
    from .infer import latest_checkpoint

    resume_path = latest_checkpoint(log_dir)
    if resume_path is not None:
        logger.info("auto-resuming from %s", resume_path)
        trainer.load_checkpoint(resume_path, load_only_params=False)
    elif config.get("pretrained_model", ""):
        trainer.load_checkpoint(
            config["pretrained_model"],
            load_only_params=config.get("load_only_params", True),
        )

    # cache warm-up (reference train.py:127-133).  F0 cache misses are filled
    # first by batched on-device labeling (labels/bulk.py — one tracker
    # dispatch per length bucket instead of one cascade call per file); the
    # loader pass afterwards only builds mel caches against warm F0 caches.
    print("Checking if all F0 data is computed...")
    from .labels.bulk import precompute_for_dataset

    warmup_t0 = time.time()
    for loader in (train_dataloader, val_dataloader):
        stats = precompute_for_dataset(loader.dataset, verbose=False)
        if stats["written"]:
            logger.info(
                "bulk-labeled %d files in %.1fs (%.1f files/s, %.1f audio-s/s)",
                stats["written"],
                stats["elapsed_s"],
                stats["files_per_second"],
                stats["audio_seconds_per_second"],
            )
    for _ in train_dataloader:
        continue
    for _ in val_dataloader:
        continue
    logger.info("cache warm-up took %.1fs total", time.time() - warmup_t0)
    print("All F0 data is computed.")

    # Self-preservation for long runs on leaky transports: some PJRT
    # clients retain a host copy of every uploaded batch (measured
    # ~7 MB/step on the axon tunnel — a 1000-epoch run was OOM-killed at
    # 129 GB RSS).  When RSS crosses the threshold, checkpoint and exit
    # cleanly (rc=RSS_EXIT_CODE) so a supervising loop can relaunch; the
    # auto-resume above continues from the saved epoch.
    max_rss_gb = training_config.get("max_rss_gb")
    if max_rss_gb is None:
        max_rss_gb = 0.8 * _total_ram_gb()  # default: restart before the OOM killer
    max_rss_gb = float(max_rss_gb or 0)  # explicit 0/false disables

    for epoch in range(int(trainer.epochs) + 1, epochs + 1):
        train_results = trainer._train_epoch()
        eval_results = trainer._eval_epoch()
        results = dict(train_results)
        results.update(eval_results)
        logger.info("--- epoch %d ---", epoch)
        for key, value in results.items():
            if isinstance(value, float):
                logger.info("%-15s: %.4f", key, value)
                writer.add_scalar(key, value, epoch)
        if (epoch % save_freq) == 0:
            trainer.save_checkpoint(osp.join(log_dir, "epoch_%05d.ckpt" % epoch))
        if max_steps is not None and trainer.steps >= max_steps:
            break
        if max_rss_gb and _rss_gb() > max_rss_gb:
            path = osp.join(log_dir, "epoch_%05d.ckpt" % epoch)
            if not osp.isfile(path):
                trainer.save_checkpoint(path, async_save=False)
            logger.warning(
                "RSS %.1f GB exceeds training.max_rss_gb=%.0f; checkpointed "
                "epoch %d and exiting for a clean relaunch (auto-resume).",
                _rss_gb(),
                max_rss_gb,
                epoch,
            )
            from .train.checkpoint import wait_for_pending_saves

            wait_for_pending_saves()
            writer.close()
            return RSS_EXIT_CODE

    # join any in-flight async checkpoint writes before declaring success
    from .train.checkpoint import wait_for_pending_saves

    wait_for_pending_saves()
    writer.close()
    return 0


if __name__ == "__main__":
    main()
