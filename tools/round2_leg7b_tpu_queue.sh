#!/bin/bash
# Round-2 leg-7b: stage-h noise/room recovery fine-tune, queued behind the
# leg-7 TPU queue (waits for its final marker).  Run detached:
#   setsid nohup bash tools/round2_leg7b_tpu_queue.sh \
#       >> results/round2/leg7b_queue.out 2>&1 < /dev/null &
set -x
cd /root/repo

# wait for the leg-7 queue to fully drain (suites_g2 is its last step)
while ! grep -q "TPU-QUEUE-LEG7-POST-DONE" results/round2/leg7_queue.out 2>/dev/null; do
  sleep 60
done

# augment-heavy corpus (noise/lowpass/clip/AGC degradations with exact
# labels preserved) + moderate dynamics so stage-g precision isn't lost
if [ ! -f Data/corpus_r2h/train_list.txt ]; then
  python tools/make_corpus.py --root Data/corpus_r2h --n 360 --n-val 20 \
    --tone-share 0.18 --sweep-share 0.17 --burst-share 0.08 --glide-share 0.12 \
    --vibrato-share 0.15 --wander-share 0.10 --augment-share 0.50 --seed 23
fi

for attempt in 1 2 3; do
  [ -f results/round2/flagship_h/epoch_00300.ckpt ] && break
  timeout 7200 python train.py --config_path Configs/config_round2h.yml \
    >> results/round2/flagship_h_train.out 2>&1
  echo "flagship_h attempt $attempt rc=$?"
done

CKPT=$(ls results/round2/flagship_h/epoch_*.ckpt 2>/dev/null | sort | tail -1)
echo "flagship_h final checkpoint: $CKPT"
if [ -n "$CKPT" ]; then
  timeout 7200 python evaluate.py \
    --checkpoint "$CKPT" \
    --config_path Configs/config_round2h.yml \
    --suites all \
    --output_dir results/round2/suites_h \
    > results/round2/suites_h.log 2>&1
  echo "suites-h rc=$?"
fi
echo "TPU-QUEUE-LEG7B-DONE"
