#!/bin/bash
# Round-3 leg 1: labeling-pipeline throughput + fresh step trace + bench.
# Chain all TPU work in ONE process tree (CLAUDE.md: never two TPU jobs).
cd /root/repo
set -x
{
  timeout 2400 python tools/bench_labeling.py \
    --batch_size 64 --batches 40 --warmup 3 \
    --corpus_files 2048 --corpus_dir /tmp/labelbench_corpus \
    --out results/round3/labeling_bench.jsonl
  timeout 1800 python tools/profile_step.py --steps 12 \
    --out results/round3/trace_leg1
  timeout 1200 python bench.py > results/round3/bench_leg1.json
} > /tmp/r3leg1.log 2>&1
echo DONE >> /tmp/r3leg1.log
