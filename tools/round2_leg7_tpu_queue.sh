#!/bin/bash
# Round-2 leg-7 TPU work queue.
#
# Babysits the flagship_g run (relaunching on crash — train.py auto-resumes
# from the newest epoch_*.ckpt in the run dir), then runs the post-training
# TPU work in sequence.  Run detached:
#   setsid nohup bash tools/round2_leg7_tpu_queue.sh \
#       >> results/round2/leg7_queue.out 2>&1 < /dev/null &
set -x
cd /root/repo

RUN=results/round2/flagship_g
CFG=Configs/config_round2g.yml
FINAL=$RUN/epoch_01100.ckpt

# ---- 1. flagship training to completion (with crash retries) ----
for attempt in 1 2 3 4 5 6; do
  if [ -f "$FINAL" ]; then break; fi
  if [ -f /tmp/flagship_g.pid ] && kill -0 "$(cat /tmp/flagship_g.pid)" 2>/dev/null; then
    # a trainer is already running (launched by the session) — wait on it
    tail --pid="$(cat /tmp/flagship_g.pid)" -f /dev/null
  else
    timeout 21600 python train.py --config_path "$CFG" \
      >> results/round2/flagship_g_train.out 2>&1
    echo "flagship_g attempt $attempt rc=$?"
  fi
done
CKPT=$(ls $RUN/epoch_*.ckpt 2>/dev/null | sort | tail -1)
echo "flagship_g final checkpoint: $CKPT"

# ---- 2. all-suite eval + vibrato diagnosis on the final checkpoint ----
if [ -n "$CKPT" ]; then
  timeout 7200 python evaluate.py \
    --checkpoint "$CKPT" \
    --config_path "$CFG" \
    --suites all \
    --output_dir results/round2/suites_g \
    > results/round2/suites_g.log 2>&1
  echo "suites rc=$?"

  timeout 3600 python tools/diagnose_vibrato.py --checkpoint "$CKPT" \
    --platform axon --csv results/round2/vibrato_diag_g.csv \
    > results/round2/vibrato_diag_g.log 2>&1
  echo "vibrato rc=$?"
fi

# ---- 3. CREPE medium self-training ----
timeout 14400 python tools/train_crepe.py --capacity medium --steps 6000 \
  --output weights/crepe_medium.npz > results/round2/crepe_medium.log 2>&1
echo "crepe-medium rc=$?"

# ---- 4. kernel/bench re-measurement + profiler trace ----
timeout 1800 python bench.py > results/round2/bench_leg7.json 2> results/round2/bench_leg7.log
echo "bench rc=$?"
PEX_BENCH_TRANSFORMER=1 timeout 1800 python bench.py \
  > results/round2/bench_leg7_tf.json 2> results/round2/bench_leg7_tf.log
echo "bench-tf rc=$?"
timeout 1800 python tools/bench_lstm.py --iters 30 \
  > results/round2/bench_lstm_leg7.jsonl 2>&1
echo "bench_lstm rc=$?"
PEX_LSTM_BF16=1 timeout 1800 python tools/bench_lstm.py --iters 30 \
  > results/round2/bench_lstm_leg7_bf16.jsonl 2>&1
echo "bench_lstm-bf16 rc=$?"
timeout 1800 python tools/profile_step.py --steps 12 \
  --out results/round2/trace_leg7 > results/round2/profile_leg7.log 2>&1
echo "profile rc=$?"

echo "TPU-QUEUE-LEG7-DONE"

# ---- 5. re-run all suites with the corrected k*hop reference timing ----
CKPT=$(ls results/round2/flagship_g/epoch_*.ckpt 2>/dev/null | sort | tail -1)
if [ -n "$CKPT" ]; then
  timeout 7200 python evaluate.py \
    --checkpoint "$CKPT" \
    --config_path Configs/config_round2g.yml \
    --suites all \
    --output_dir results/round2/suites_g2 \
    > results/round2/suites_g2.log 2>&1
  echo "suites-g2 rc=$?"
fi
echo "TPU-QUEUE-LEG7-POST-DONE"
