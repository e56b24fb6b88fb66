#!/bin/bash
# Round-3 leg 4: long flagship BiLSTM + long transformer on corpus_r3,
# full six suites each, neural-labeler room-grid ceilings, final bench.
cd /root/repo
{
  while [ ! -f /tmp/r3leg3.log ] || ! grep -q DONE /tmp/r3leg3.log; do sleep 30; done
  set -x
  timeout 7200 python train.py --config_path Configs/config_r3_flagship.yml
  timeout 3600 python evaluate.py \
    --checkpoint_dir results/round3/flagship_r3 \
    --config_path Configs/config_r3_flagship.yml \
    --suites all --output_dir results/round3/suites_flagship \
    > results/round3/suites_flagship_summary.json
  timeout 7200 python train.py --config_path Configs/config_r3_transformer_long.yml
  timeout 3600 python evaluate.py \
    --checkpoint_dir results/round3/transformer_r3 \
    --config_path Configs/config_r3_transformer_long.yml \
    --suites all --output_dir results/round3/suites_transformer \
    > results/round3/suites_transformer_summary.json
  timeout 3600 python tools/labeler_ceiling.py --platform axon \
    --backends jax_ac,jax_pyin,crepe,swiftf0 \
    --csv results/round3/labeler_ceiling_room.csv
  timeout 2400 python bench.py > results/round3/bench_leg4.json
} > /tmp/r3leg4.log 2>&1
echo DONE >> /tmp/r3leg4.log
