#!/bin/bash
# Round-2 TPU work queue: runs after the CPU-bound parity stages finish.
# Each stage logs to results/round2/.
set -x
cd /root/repo

# 1. flagship retrain on the tone-mixed corpus (TPU)
timeout 14400 python train.py --config_path Configs/config_round2.yml \
  > results/round2/flagship_train.out 2>&1
echo "flagship rc=$?"

# 2. robustness suites with the new checkpoint
timeout 7200 python evaluate.py \
  --checkpoint_dir results/round2/flagship \
  --config_path Configs/config_round2.yml \
  --suites dynamic_pitch,amplitude,pitch_range_timbre \
  --output_dir results/round2/suites \
  > results/round2/suites.log 2>&1
echo "suites rc=$?"

# 3. SwiftF0 v2 labeler training (TPU)
timeout 7200 python tools/train_swiftf0.py --steps 4000 --arch v2 \
  --output weights/swiftf0_v2.npz > results/round2/swiftf0_v2.log 2>&1
echo "swiftf0 rc=$?"

# 4. CREPE small training (TPU)
timeout 10800 python tools/train_crepe.py --capacity small --steps 4000 \
  --output weights/crepe_small.npz > results/round2/crepe_small.log 2>&1
echo "crepe rc=$?"

echo "TPU-QUEUE-DONE"
