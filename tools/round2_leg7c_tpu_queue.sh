#!/bin/bash
# Round-2 leg-7c: stage-i reverb/pink-noise recovery fine-tune from stage h.
# Run detached after leg-7b:
#   setsid nohup bash tools/round2_leg7c_tpu_queue.sh \
#       >> results/round2/leg7c_queue.out 2>&1 < /dev/null &
set -x
cd /root/repo

while ! grep -q "TPU-QUEUE-LEG7B-DONE" results/round2/leg7b_queue.out 2>/dev/null; do
  sleep 60
done

if [ ! -f Data/corpus_r2i/train_list.txt ]; then
  python tools/make_corpus.py --root Data/corpus_r2i --n 300 --n-val 16 \
    --tone-share 0.15 --sweep-share 0.15 --burst-share 0.05 --glide-share 0.10 \
    --vibrato-share 0.15 --wander-share 0.15 --augment-share 0.70 \
    --augment-weights 1,1,1,1,3,5 --seed 29
  cat Data/corpus_r2h/train_list.txt Data/corpus_r2i/train_list.txt \
    > Data/corpus_r2i/train_union.txt
  cat Data/corpus_r2h/val_list.txt Data/corpus_r2i/val_list.txt \
    > Data/corpus_r2i/val_union.txt
fi

for attempt in 1 2 3; do
  [ -f results/round2/flagship_i/epoch_00300.ckpt ] && break
  timeout 7200 python train.py --config_path Configs/config_round2i.yml \
    >> results/round2/flagship_i_train.out 2>&1
  echo "flagship_i attempt $attempt rc=$?"
done

CKPT=$(ls results/round2/flagship_i/epoch_*.ckpt 2>/dev/null | sort | tail -1)
echo "flagship_i final checkpoint: $CKPT"
if [ -n "$CKPT" ]; then
  timeout 7200 python evaluate.py \
    --checkpoint "$CKPT" \
    --config_path Configs/config_round2i.yml \
    --suites all \
    --output_dir results/round2/suites_i \
    > results/round2/suites_i.log 2>&1
  echo "suites-i rc=$?"
fi
echo "TPU-QUEUE-LEG7C-DONE"
