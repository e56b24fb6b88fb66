#!/usr/bin/env python
"""A/B the cost of dropout RNG in the flagship training step.

The jitted train step folds the step counter into a threefry PRNG key and
draws dropout masks inside the compiled step (train/trainer.py
``_build_train_step``).  Threefry keygen is pure ALU work on TPU and has no
reference counterpart (the torch reference uses the cuDNN stateful RNG), so
this measures what the RNG actually costs on-chip and whether the cheaper
``rbg``/``unsafe_rbg`` generators (XLA RngBitGenerator) are worth a config
knob.

The variant drives ``training.dropout_prng`` (a typed ``jax.random.key``
carrying its impl), so no global PRNG flag is needed; still run one variant
per process so each gets a clean device claim and compile:

  python tools/dropout_rng_ab.py --prng threefry --dropout 0.1
  python tools/dropout_rng_ab.py --prng unsafe_rbg --dropout 0.1
  python tools/dropout_rng_ab.py --prng threefry --dropout 0.0   # no-RNG bound

Protocol matches bench.py: fresh host batches through the transfer-prefetch
path, median of windows, scalar fetch for remote-transport sync.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prng", choices=["threefry", "rbg", "unsafe_rbg"], default="threefry")
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--frames", type=int, default=192)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--out", default=None, help="append one JSON line here")
    args = ap.parse_args()

    from pitchextractor_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from pitchextractor_tpu.models import JDCNet, activation_dtype_from
    from pitchextractor_tpu.parallel import make_mesh
    from pitchextractor_tpu.train import Trainer, build_optimizer

    model = JDCNet(
        num_class=1,
        sequence_model_config={
            "model_type": "bilstm",
            "num_layers": 4,
            "dropout": args.dropout,
        },
        dtype=activation_dtype_from("bf16"),
    )
    tx, schedule = build_optimizer(
        {
            "params": None,
            "optimizer_params": {"lr": 3e-4},
            "scheduler_params": {"max_lr": 3e-4, "epochs": 100, "steps_per_epoch": 100},
        }
    )
    trainer = Trainer(
        model=model,
        optimizer=tx,
        scheduler=schedule,
        config={"training": {"dropout_prng": args.prng}},
        loss_config={"lambda_f0": 0.1},
        use_mixed_precision=True,
        mesh=make_mesh(model_parallel=1),
        n_mels=80,
        max_mel_length=args.frames,
    )

    rng = np.random.default_rng(0)
    B, T = args.batch_size, args.frames
    pool = []
    for _ in range(16):
        mels = rng.standard_normal((B, 1, 80, T)).astype(np.float32)
        f0 = np.abs(rng.standard_normal((B, T))).astype(np.float32) * 200
        sil = (f0 < 100).astype(np.float32)
        pool.append((mels, f0, sil))

    for i in range(args.warmup):
        metrics = trainer.run(pool[i % len(pool)])
    if args.warmup:
        float(metrics["loss"])  # remote-transport sync (see bench.py NOTE)

    window_rates = []
    step_idx = 0
    for _ in range(args.windows):
        fresh = (pool[(step_idx + k) % len(pool)] for k in range(args.steps))
        step_idx += args.steps
        t0 = time.perf_counter()
        for placed, _ in trainer._prefetch_placed(fresh):
            metrics = trainer.run(placed)
        float(metrics["loss"])
        window_rates.append(B * args.steps / (time.perf_counter() - t0))

    utt = float(np.median(window_rates))
    row = {
        "prng": args.prng,
        "dropout": args.dropout,
        "utt_per_sec": round(utt, 1),
        "step_ms": round(1000.0 * B / utt, 2),
        "windows": [round(r, 1) for r in window_rates],
        "batch_size": B,
        "frames": T,
    }
    print(json.dumps(row))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
