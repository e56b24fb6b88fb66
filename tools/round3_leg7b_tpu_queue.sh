#!/bin/bash
# Round-3 leg 7b: the leg-7 train timeout would have killed the b0_control
# trainer ~5 min before epoch 200 (the 1-core host feeds ~150 utt/s, so an
# epoch is ~10 s, slower than planned).  The queue script + timeout wrapper
# were killed by PID, leaving the trainer to finish; this follow-up waits for
# it and spends the remaining session budget in priority order:
#   1. bench.py (driver-bench compile-cache warm; mostly cached by training).
#   2. b0_control dynamic_pitch suite -> dp_summary.json (the equal-budget
#      headline number vs t0/t1's committed dp_summary).
#   3. Full suites for b0 and t1 with whatever time remains (partial CSVs
#      are still evidence; summarize reports skips).
# Usage: TRAIN_PID=<pid> DEADLINE=<epoch-s> bash tools/round3_leg7b_tpu_queue.sh
cd /root/repo
DEADLINE=${DEADLINE:-$(date -d "04:02" +%s)}
TRAIN_PID=${TRAIN_PID:?}
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }
{
  set -x
  while kill -0 "$TRAIN_PID" 2>/dev/null; do
    [ "$(left)" -gt 2 ] || { kill "$TRAIN_PID"; sleep 10; break; }
    sleep 10
  done
  ls -la results/round3/tx_b0_control/
  if [ "$(left)" -gt 4 ]; then
    timeout $(( ($(left) - 1) * 60 )) python bench.py > results/round3/bench_leg7.json
  fi
  if [ "$(left)" -gt 4 ]; then
    timeout $(( ($(left) - 1) * 60 )) python evaluate.py \
      --checkpoint_dir results/round3/tx_b0_control \
      --config_path Configs/config_r3_b0_control.yml \
      --suites dynamic_pitch \
      --output_dir results/round3/tx_b0_control/suites \
      > results/round3/tx_b0_control/dp_summary.json
  fi
  if [ "$(left)" -gt 4 ]; then
    timeout $(( ($(left) - 1) * 60 )) python evaluate.py \
      --checkpoint_dir results/round3/tx_b0_control \
      --config_path Configs/config_r3_b0_control.yml \
      --suites all --output_dir results/round3/suites_b0 \
      > results/round3/suites_b0_summary.json
  fi
  if [ "$(left)" -gt 4 ]; then
    timeout $(( ($(left) - 1) * 60 )) python evaluate.py \
      --checkpoint_dir results/round3/tx_t1_warm \
      --config_path Configs/config_r3_t1_warm.yml \
      --suites all --output_dir results/round3/suites_t1 \
      > results/round3/suites_t1_summary.json
  fi
} > /tmp/r3leg7b.log 2>&1
echo DONE >> /tmp/r3leg7b.log
