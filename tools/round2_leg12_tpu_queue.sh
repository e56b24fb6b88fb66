#!/bin/bash
# Round-2 leg-12 TPU queue: waits for the leg-11 queue to release the TPU
# (TPU-QUEUE-LEG11-DONE marker), then runs the batch-size throughput sweep.
# Run detached:
#   setsid nohup bash tools/round2_leg12_tpu_queue.sh \
#       >> results/round2/leg12_queue.out 2>&1 < /dev/null &
set -x
cd /root/repo

# 1) wait for the leg-11 queue to finish (it ends with this marker)
while ! grep -q "TPU-QUEUE-LEG11-DONE" results/round2/leg11_queue.out; do
  sleep 120
done

# 2) batch-size throughput sweep (first compiles of new batch shapes are
#    slow over the tunnel; generous timeout)
timeout 7200 python tools/bench_batch_sweep.py \
  --out results/round2/batch_sweep.json \
  > results/round2/batch_sweep.log 2>&1
echo "batch-sweep rc=$?"
echo "TPU-QUEUE-LEG12-DONE"
