#!/bin/bash
# Round-2 leg-7d: stage-j final reverb push from stage i.  Run detached:
#   setsid nohup bash tools/round2_leg7d_tpu_queue.sh \
#       >> results/round2/leg7d_queue.out 2>&1 < /dev/null &
set -x
cd /root/repo

while ! grep -q "TPU-QUEUE-LEG7C-DONE" results/round2/leg7c_queue.out 2>/dev/null; do
  sleep 60
done

if [ ! -f Data/corpus_r2j/train_list.txt ]; then
  python tools/make_corpus.py --root Data/corpus_r2j --n 280 --n-val 16 \
    --tone-share 0.12 --sweep-share 0.13 --burst-share 0.05 --glide-share 0.10 \
    --vibrato-share 0.15 --wander-share 0.20 --augment-share 0.80 \
    --augment-weights 1,1,1,1,2,8 --seed 31
  cat Data/corpus_r2i/train_union.txt Data/corpus_r2j/train_list.txt \
    > Data/corpus_r2j/train_union.txt
  cat Data/corpus_r2i/val_union.txt Data/corpus_r2j/val_list.txt \
    > Data/corpus_r2j/val_union.txt
fi

for attempt in 1 2 3; do
  [ -f results/round2/flagship_j/epoch_00250.ckpt ] && break
  timeout 7200 python train.py --config_path Configs/config_round2j.yml \
    >> results/round2/flagship_j_train.out 2>&1
  echo "flagship_j attempt $attempt rc=$?"
done

CKPT=$(ls results/round2/flagship_j/epoch_*.ckpt 2>/dev/null | sort | tail -1)
echo "flagship_j final checkpoint: $CKPT"
if [ -n "$CKPT" ]; then
  timeout 7200 python evaluate.py \
    --checkpoint "$CKPT" \
    --config_path Configs/config_round2j.yml \
    --suites all \
    --output_dir results/round2/suites_j \
    > results/round2/suites_j.log 2>&1
  echo "suites-j rc=$?"
fi
echo "TPU-QUEUE-LEG7D-DONE"
