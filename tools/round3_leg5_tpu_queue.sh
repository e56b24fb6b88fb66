#!/bin/bash
# Round-3 leg 5 (post-reset relaunch): the machine reset killed leg 3 midway
# (t3/b0_control never ran) and wiped the XLA compile cache + Data/.
# This queue rebuilds the round-3 evidence in priority order, deadline-aware
# so the TPU is free for the driver bench:
#   1. b0_control (200-epoch BiLSTM, the equal-budget control for the
#      transformer diagnosis) + its dynamic_pitch suite.
#   2. Equal-budget FULL-suite comparison: b0_control vs t1_warm (VERDICT #5).
#   3. Round-3 flagship (350-epoch BiLSTM) + full suites.
#   4. bench.py once (re-warms the wiped compile cache for the driver bench).
# t3_lowlr is skipped: t2 (lowlr+warm) already shows low LR underconverges
# at this budget (eval/f0 6.62 vs t0 0.71); t3 (lowlr, no warmup) is strictly
# worse a priori.  transformer_long is skipped for time; t1@200ep is the
# committed transformer evidence.
cd /root/repo
DEADLINE=${DEADLINE:-$(date -d "22:25" +%s)}
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }
{
  set -x
  # 1. BiLSTM control train (auto-resume makes a timeout recoverable)
  if [ "$(left)" -gt 45 ]; then
    timeout $(( ($(left) - 12) * 60 )) python train.py \
      --config_path Configs/config_r3_b0_control.yml
    timeout 1500 python evaluate.py \
      --checkpoint_dir results/round3/tx_b0_control \
      --config_path Configs/config_r3_b0_control.yml \
      --suites dynamic_pitch \
      --output_dir results/round3/tx_b0_control/suites \
      > results/round3/tx_b0_control/dp_summary.json
  fi
  # 2. equal-budget full-suite comparison (VERDICT #5 evidence)
  if [ "$(left)" -gt 30 ]; then
    timeout 2100 python evaluate.py \
      --checkpoint_dir results/round3/tx_b0_control \
      --config_path Configs/config_r3_b0_control.yml \
      --suites all --output_dir results/round3/suites_b0 \
      > results/round3/suites_b0_summary.json
  fi
  if [ "$(left)" -gt 25 ]; then
    timeout 2100 python evaluate.py \
      --checkpoint_dir results/round3/tx_t1_warm \
      --config_path Configs/config_r3_t1_warm.yml \
      --suites all --output_dir results/round3/suites_t1 \
      > results/round3/suites_t1_summary.json
  fi
  # 3. round-3 flagship + suites, budget-bounded (auto-resume + save_freq 70)
  if [ "$(left)" -gt 45 ]; then
    timeout $(( ($(left) - 30) * 60 )) python train.py \
      --config_path Configs/config_r3_flagship.yml
    timeout 1800 python evaluate.py \
      --checkpoint_dir results/round3/flagship_r3 \
      --config_path Configs/config_r3_flagship.yml \
      --suites all --output_dir results/round3/suites_flagship \
      > results/round3/suites_flagship_summary.json
  fi
  # 4. warm the driver-bench cache
  if [ "$(left)" -gt 3 ]; then
    timeout 900 python bench.py > results/round3/bench_leg5.json
  fi
} > /tmp/r3leg5.log 2>&1
echo DONE >> /tmp/r3leg5.log
