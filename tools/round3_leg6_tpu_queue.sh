#!/bin/bash
# Round-3 leg 6: recovery from the 21:00 tunnel wedge (axon-conn-write stuck
# in sk_stream_wait_memory; the b0_control trainer blocked forever on a dead
# device call at epoch 193/200 and was killed by PID).  Waits for the TPU
# claim to clear (probe loop), then finishes the round-3 evidence, trimmed
# to the remaining budget:
#   1. b0_control: auto-resume from epoch_00100 under a retry babysitter
#      (another wedge costs one timeout, not the leg).
#   2. suites_b0 + suites_t1 (full "all" — includes dynamic_pitch, so the
#      separate dp run from leg 5 is dropped as redundant).
#   3. bench.py if time remains (re-warms the driver-bench cache).
cd /root/repo
DEADLINE=${DEADLINE:-$(date -d "22:25" +%s)}
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }
{
  while ! grep -q TPU-OK /tmp/probe_out.txt 2>/dev/null; do sleep 15; done
  set -x
  # 1. finish the BiLSTM control (resume epoch 100 -> 200), max 2 attempts
  for attempt in 1 2; do
    if [ -f results/round3/tx_b0_control/epoch_00200.ckpt ]; then break; fi
    [ "$(left)" -gt 30 ] || break
    timeout $(( ($(left) - 28) * 60 )) python train.py \
      --config_path Configs/config_r3_b0_control.yml
  done
  # 2. equal-budget full-suite comparison (VERDICT #5 evidence)
  if [ "$(left)" -gt 18 ]; then
    timeout $(( ($(left) - 14) * 60 )) python evaluate.py \
      --checkpoint_dir results/round3/tx_b0_control \
      --config_path Configs/config_r3_b0_control.yml \
      --suites all --output_dir results/round3/suites_b0 \
      > results/round3/suites_b0_summary.json
  fi
  if [ "$(left)" -gt 14 ]; then
    timeout $(( ($(left) - 4) * 60 )) python evaluate.py \
      --checkpoint_dir results/round3/tx_t1_warm \
      --config_path Configs/config_r3_t1_warm.yml \
      --suites all --output_dir results/round3/suites_t1 \
      > results/round3/suites_t1_summary.json
  fi
  # 3. warm the driver-bench cache
  if [ "$(left)" -gt 3 ]; then
    timeout $(( $(left) * 60 )) python bench.py > results/round3/bench_leg6.json
  fi
} > /tmp/r3leg6.log 2>&1
echo DONE >> /tmp/r3leg6.log
