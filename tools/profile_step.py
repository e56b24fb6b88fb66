#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship training step and print a
device-time summary.

The reference stack has no profiling at all (SURVEY.md §5.1); this drives
``utils/profiler.trace`` around N jitted train steps on the current platform
(real chip under axon) and reports wall-clock stats plus where the trace
landed, so a TensorBoard/XProf session can inspect op-level device time.

Usage:
  python tools/profile_step.py --steps 12 --out results/round2/trace
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--frames", type=int, default=192)
    ap.add_argument("--out", default="results/round2/trace")
    args = ap.parse_args()

    import numpy as np

    from pitchextractor_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from pitchextractor_tpu.models import JDCNet
    from pitchextractor_tpu.parallel import make_mesh
    from pitchextractor_tpu.train import Trainer, build_optimizer
    from pitchextractor_tpu.utils.profiler import StepTimer, trace

    cfg = {
        "model_type": "bilstm",
        "hidden_size": 384,
        "num_layers": 4,
        "dropout": 0.1,
    }
    from pitchextractor_tpu.models import activation_dtype_from

    model = JDCNet(
        num_class=1,
        sequence_model_config=cfg,
        dtype=None
        if os.environ.get("PEX_CONV_F32")
        else activation_dtype_from("bf16"),
    )
    tx, schedule = build_optimizer(
        {
            "params": None,
            "optimizer_params": {"lr": 3e-4},
            "scheduler_params": {"max_lr": 3e-4, "epochs": 10, "steps_per_epoch": 50},
        }
    )
    trainer = Trainer(
        model=model,
        optimizer=tx,
        scheduler=schedule,
        loss_config={"lambda_f0": 0.1},
        use_mixed_precision=True,
        mesh=make_mesh(model_parallel=1),
        n_mels=80,
        max_mel_length=args.frames,
    )

    rng = np.random.default_rng(0)
    B, T = args.batch_size, args.frames

    def fresh_batch():
        mels = rng.standard_normal((B, 1, 80, T)).astype(np.float32)
        f0 = np.abs(200 + 50 * rng.standard_normal((B, T))).astype(np.float32)
        sil = (rng.random((B, T)) < 0.2).astype(np.float32)
        return mels, f0, sil

    for _ in range(args.warmup):
        trainer.run(fresh_batch())
    jax.block_until_ready(trainer.state.params)

    timer = StepTimer(warmup=0)
    os.makedirs(args.out, exist_ok=True)
    with trace(args.out):
        for _ in range(args.steps):
            with timer.step(items=B):
                metrics = trainer.run(fresh_batch())
                jax.block_until_ready(metrics["loss"])

    summary = timer.summary()
    print("trace dir:", args.out)
    for key, value in summary.items():
        print(f"{key}: {value:.2f}" if isinstance(value, float) else f"{key}: {value}")
    sizes = []
    for dirpath, _, files in os.walk(args.out):
        sizes += [os.path.join(dirpath, f) for f in files]
    print(f"trace files: {len(sizes)}")


if __name__ == "__main__":
    main()
