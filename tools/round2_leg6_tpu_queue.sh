#!/bin/bash
# Round-2 leg-6 TPU work queue: launched once the axon tunnel recovers.
# 1. stage-f2 resume (full-state restore from flagship_f epoch 100)
# 2. all-suite eval + vibrato re-diagnosis on the final checkpoint
# 3. CREPE medium self-training
# 4. kernel/bench re-measurement + profiler trace
set -x
cd /root/repo

timeout 16200 python train.py --config_path Configs/config_round2f_resume.yml \
  --max_steps 8500 > results/round2/flagship_f2_train.out 2>&1
echo "flagship_f2 rc=$?"

CKPT=$(ls results/round2/flagship_f2/epoch_*.ckpt 2>/dev/null | sort | tail -1)
echo "latest f2 checkpoint: $CKPT"

if [ -n "$CKPT" ]; then
  timeout 7200 python evaluate.py \
    --checkpoint "$CKPT" \
    --config_path Configs/config_round2f_resume.yml \
    --suites all \
    --output_dir results/round2/suites_f2 \
    > results/round2/suites_f2.log 2>&1
  echo "suites rc=$?"

  timeout 3600 python tools/diagnose_vibrato.py --checkpoint "$CKPT" \
    --platform axon --csv results/round2/vibrato_diag_f2.csv \
    > results/round2/vibrato_diag_f2.log 2>&1
  echo "vibrato rc=$?"
fi

timeout 10800 python tools/train_crepe.py --capacity medium --steps 6000 \
  --output weights/crepe_medium.npz > results/round2/crepe_medium.log 2>&1
echo "crepe-medium rc=$?"

timeout 1800 python bench.py > results/round2/bench_leg6.json 2> results/round2/bench_leg6.log
echo "bench rc=$?"
timeout 1800 python tools/bench_lstm.py --iters 30 \
  > results/round2/bench_lstm_leg6.jsonl 2>&1
echo "bench_lstm rc=$?"
timeout 1800 python tools/profile_step.py --steps 12 \
  --out results/round2/trace_leg6 > results/round2/profile_leg6.log 2>&1
echo "profile rc=$?"

echo "TPU-QUEUE-LEG6-DONE"
