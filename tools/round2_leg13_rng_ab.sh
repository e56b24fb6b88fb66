#!/bin/bash
# Leg-13 dropout/RNG A/B: three variants chained in ONE TPU process queue
# (CLAUDE.md: never run two TPU jobs at once).  Run detached:
#   setsid nohup bash tools/round2_leg13_rng_ab.sh > results/round2/rng_ab.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=results/round2/rng_ab.jsonl
mkdir -p results/round2
: > "$OUT"

run() {
  echo "=== $* $(date +%T) ==="
  timeout 900 python tools/dropout_rng_ab.py --out "$OUT" "$@"
  echo "rc=$?"
}

run --prng threefry --dropout 0.1     # current training default
run --prng unsafe_rbg --dropout 0.1   # cheapest XLA RngBitGenerator
run --prng rbg --dropout 0.1          # deterministic-across-shardings rbg
run --prng threefry --dropout 0.0     # no-RNG lower bound (masks elided)
# repeat the baseline last: the first run may contend with a concurrent
# CPU pytest on this 1-core host; the final row is the clean measurement
run --prng threefry --dropout 0.1
echo "=== done $(date +%T) ==="
