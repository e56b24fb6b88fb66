#!/bin/bash
# Regenerate the round-2 training corpora and the stage-f/g union lists.
#
# The per-stage mixes follow the stage configs' documented recipes
# (Configs/config_round2{c,d,e}.yml headers); the union (1080 train / 60 val
# = 1140 files) is what the stage-f/g consolidation runs train on.  Run dirs
# and Data/ are gitignored — this script is the reproducible source of truth
# after an environment reset.
set -ex
cd "$(dirname "$0")/.."

python tools/make_corpus.py --root Data/corpus_r2c --n 360 --n-val 20 \
  --tone-share 0.40 --sweep-share 0.35 --burst-share 0.10 --seed 13
python tools/make_corpus.py --root Data/corpus_r2d --n 360 --n-val 20 \
  --tone-share 0.23 --sweep-share 0.22 --burst-share 0.10 --glide-share 0.15 \
  --augment-share 0.35 --seed 17
python tools/make_corpus.py --root Data/corpus_r2e --n 360 --n-val 20 \
  --tone-share 0.20 --sweep-share 0.15 --burst-share 0.05 --glide-share 0.08 \
  --vibrato-share 0.22 --wander-share 0.15 --augment-share 0.20 --seed 19

mkdir -p Data/corpus_r2f
cat Data/corpus_r2c/train_list.txt Data/corpus_r2d/train_list.txt \
    Data/corpus_r2e/train_list.txt > Data/corpus_r2f/train_list.txt
cat Data/corpus_r2c/val_list.txt Data/corpus_r2d/val_list.txt \
    Data/corpus_r2e/val_list.txt > Data/corpus_r2f/val_list.txt
wc -l Data/corpus_r2f/train_list.txt Data/corpus_r2f/val_list.txt
echo CORPORA-DONE
