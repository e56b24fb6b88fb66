#!/bin/bash
# Round-2 leg-7e: stage-k steep-glide fine-tune from stage j.  Run detached:
#   setsid nohup bash tools/round2_leg7e_tpu_queue.sh \
#       >> results/round2/leg7e_queue.out 2>&1 < /dev/null &
set -x
cd /root/repo

while ! grep -q "TPU-QUEUE-LEG7D-DONE" results/round2/leg7d_queue.out 2>/dev/null; do
  sleep 60
done

if [ ! -f Data/corpus_r2k/train_list.txt ]; then
  python tools/make_corpus.py --root Data/corpus_r2k --n 280 --n-val 16 \
    --tone-share 0.10 --sweep-share 0.10 --burst-share 0.05 --glide-share 0.10 \
    --vibrato-share 0.12 --wander-share 0.08 --steepglide-share 0.35 \
    --augment-share 0.30 --augment-weights 1,1,1,1,2,4 --seed 37
  cat Data/corpus_r2j/train_union.txt Data/corpus_r2k/train_list.txt \
    > Data/corpus_r2k/train_union.txt
  cat Data/corpus_r2j/val_union.txt Data/corpus_r2k/val_list.txt \
    > Data/corpus_r2k/val_union.txt
fi

for attempt in 1 2 3; do
  [ -f results/round2/flagship_k/epoch_00250.ckpt ] && break
  timeout 7200 python train.py --config_path Configs/config_round2k.yml \
    >> results/round2/flagship_k_train.out 2>&1
  echo "flagship_k attempt $attempt rc=$?"
done

CKPT=$(ls results/round2/flagship_k/epoch_*.ckpt 2>/dev/null | sort | tail -1)
echo "flagship_k final checkpoint: $CKPT"
if [ -n "$CKPT" ]; then
  timeout 7200 python evaluate.py \
    --checkpoint "$CKPT" \
    --config_path Configs/config_round2k.yml \
    --suites all \
    --output_dir results/round2/suites_k \
    > results/round2/suites_k.log 2>&1
  echo "suites-k rc=$?"
fi
echo "TPU-QUEUE-LEG7E-DONE"
