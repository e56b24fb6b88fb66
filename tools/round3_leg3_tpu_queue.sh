#!/bin/bash
# Round-3 leg 3: transformer-head diagnosis A/B (VERDICT #5).
# Waits for leg 2 (bench A/B) to release the TPU, then runs the five
# 200-epoch diagnosis trainings + a dynamic_pitch suite on each.
cd /root/repo
{
  while [ ! -f /tmp/r3leg2.log ] || ! grep -q DONE /tmp/r3leg2.log; do sleep 30; done
  while ! grep -q R3-CORPUS-DONE /tmp/r3corpus.log 2>/dev/null; do sleep 15; done
  set -x
  for v in t0_base t1_warm t2_lowlr_warm t3_lowlr b0_control; do
    timeout 4200 python train.py --config_path Configs/config_r3_${v}.yml
    timeout 1800 python evaluate.py \
      --checkpoint_dir results/round3/tx_${v} \
      --config_path Configs/config_r3_${v}.yml \
      --suites dynamic_pitch \
      --output_dir results/round3/tx_${v}/suites > results/round3/tx_${v}/dp_summary.json
  done
} > /tmp/r3leg3.log 2>&1
echo DONE >> /tmp/r3leg3.log
