#!/usr/bin/env python
"""Batch-size sweep for the training-throughput bench.

The driver bench (bench.py) reports utt/s/chip at B=64 — the reference's
training default (reference Configs/config.yml:4, batch_size: 64).  Larger
batches amortise per-step overhead and may raise per-chip throughput now
that the VMEM-fit guard lets any batch compile and the trunk runs bf16.
This sweep measures a few batch sizes with the same hardened protocol
(fresh prefetched host batches, median of windows) so a bench default
change is evidence-based.

Usage:
  python tools/bench_batch_sweep.py [--sizes 64,96,128,192,256]
      [--steps 30] [--windows 3] [--out results/round2/batch_sweep.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="64,96,128,192,256")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--out", default="results/round2/batch_sweep.json")
    args = ap.parse_args()

    from pitchextractor_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import _bench_train_step

    results = {}
    for b in [int(s) for s in args.sizes.split(",") if s.strip()]:
        try:
            r = _bench_train_step(batch_size=b, steps=args.steps, windows=args.windows)
            results[str(b)] = {
                "utt_per_sec_per_chip": round(r["train_utt_per_sec_per_chip"], 1),
                "step_ms": round(r["train_step_ms"], 2),
                "windows": r["train_window_utt_per_sec"],
            }
            print(f"B={b}: {results[str(b)]}", flush=True)
        except Exception as exc:  # keep sweeping; a too-big batch may OOM
            results[str(b)] = {"error": repr(exc)}
            print(f"B={b}: ERROR {exc!r}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    best = max(
        (v["utt_per_sec_per_chip"], k)
        for k, v in results.items()
        if "utt_per_sec_per_chip" in v
    )
    print(f"best: B={best[1]} at {best[0]} utt/s/chip")


if __name__ == "__main__":
    main()
