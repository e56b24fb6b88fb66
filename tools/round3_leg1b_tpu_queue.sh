#!/bin/bash
# Round-3 leg 1b: re-measure labeling pipeline after the dequant-jit fix.
cd /root/repo
set -x
{
  timeout 2400 python tools/bench_labeling.py \
    --batch_size 64 --batches 40 --warmup 3 \
    --corpus_files 2048 --corpus_dir /tmp/labelbench_corpus \
    --out results/round3/labeling_bench2.jsonl
} > /tmp/r3leg1b.log 2>&1
echo DONE >> /tmp/r3leg1b.log
