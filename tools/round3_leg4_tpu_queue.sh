#!/bin/bash
# Round-3 leg 4 (deadline-aware): equal-budget suite comparison for the
# transformer diagnosis, a round-3 flagship train+suites, neural-labeler
# ceilings, final bench.  Hard deadline leaves the TPU free for the driver.
cd /root/repo
DEADLINE=$(date -d "21:20" +%s 2>/dev/null || echo 0)
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }
{
  while [ ! -f /tmp/r3leg3.log ] || ! grep -q DONE /tmp/r3leg3.log; do sleep 30; done
  set -x
  # 1. equal-budget (200-epoch) full-suite comparison: VERDICT #5 evidence
  timeout 2400 python evaluate.py \
    --checkpoint_dir results/round3/tx_b0_control \
    --config_path Configs/config_r3_b0_control.yml \
    --suites all --output_dir results/round3/suites_b0 \
    > results/round3/suites_b0_summary.json
  timeout 2400 python evaluate.py \
    --checkpoint_dir results/round3/tx_t1_warm \
    --config_path Configs/config_r3_t1_warm.yml \
    --suites all --output_dir results/round3/suites_t1 \
    > results/round3/suites_t1_summary.json
  # 2. round-3 flagship (350-epoch BiLSTM) + full suites, if >70 min left
  if [ "$(left)" -gt 70 ]; then
    timeout $(( ($(left) - 25) * 60 )) python train.py --config_path Configs/config_r3_flagship.yml
    timeout 2400 python evaluate.py \
      --checkpoint_dir results/round3/flagship_r3 \
      --config_path Configs/config_r3_flagship.yml \
      --suites all --output_dir results/round3/suites_flagship \
      > results/round3/suites_flagship_summary.json
  fi
  # 3. neural-labeler room-grid ceilings + final bench, if >25 min left
  if [ "$(left)" -gt 25 ]; then
    timeout 1800 python tools/labeler_ceiling.py --platform axon \
      --backends jax_ac,jax_pyin,crepe,swiftf0 \
      --csv results/round3/labeler_ceiling_room.csv
  fi
  if [ "$(left)" -gt 12 ]; then
    timeout 900 python bench.py > results/round3/bench_leg4.json
  fi
  # 4. transformer long run only if the deadline somehow allows
  if [ "$(left)" -gt 75 ]; then
    timeout $(( ($(left) - 25) * 60 )) python train.py --config_path Configs/config_r3_transformer_long.yml
    timeout 2400 python evaluate.py \
      --checkpoint_dir results/round3/transformer_r3 \
      --config_path Configs/config_r3_transformer_long.yml \
      --suites all --output_dir results/round3/suites_transformer \
      > results/round3/suites_transformer_summary.json
  fi
} > /tmp/r3leg4.log 2>&1
echo DONE >> /tmp/r3leg4.log
