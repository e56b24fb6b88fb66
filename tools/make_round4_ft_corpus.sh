#!/bin/bash
# Round-4 ft2 corpus: corpus_r3 UNION an augment-heavy mix.  corpus_r4ft
# draws 50% of files through the degradation augmenter, weighted 3x toward
# the pink-noise/reverb families the eval suites probe (the round-2 ladder's
# stage-h/i recipe, RESULTS.md).  Data/ is gitignored; this script is the
# reproducible source of truth.  Idempotent: skips work already on disk.
set -ex
cd "$(dirname "$0")/.."
if [ ! -f Data/corpus_r3/train_list.txt ]; then
  bash tools/make_round3_corpus.sh
fi
if [ ! -f Data/corpus_r4ft/train_list.txt ]; then
  python tools/make_corpus.py --root Data/corpus_r4ft --n 800 --n-val 40 \
    --tone-share 0.12 --sweep-share 0.12 --burst-share 0.04 --glide-share 0.08 \
    --vibrato-share 0.15 --wander-share 0.10 --steepglide-share 0.10 \
    --augment-share 0.50 --augment-weights 1,1,1,1,3,3 --seed 47
fi
mkdir -p Data/corpus_r4
cat Data/corpus_r3/train_list.txt Data/corpus_r4ft/train_list.txt \
  > Data/corpus_r4/train_union.txt
cat Data/corpus_r3/val_list.txt Data/corpus_r4ft/val_list.txt \
  > Data/corpus_r4/val_union.txt
echo R4-FT-CORPUS-DONE
