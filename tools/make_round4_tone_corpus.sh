#!/bin/bash
# Round-4 ft3b corpus: pure-sine-dense mix targeting the band holes the
# exact-renderer tone map exposed (RESULTS round-4 leg D: +60-220 cent
# biases at 160/200/260-330 Hz on single-partial sines — the robustness
# suites' stimulus regime, but only ~4.5% of corpus_r3 files).  corpus_r4t
# is 45% pure tones (tone-partials-max 1, log-uniform 80-500 Hz) + the
# wander/sweep/vibrato classes the codec/noise suite bases use; the train
# list unions it with the degradation-weighted corpus_r4 mix so the
# fine-tune can't forget the augmented families.  Idempotent.
set -ex
cd "$(dirname "$0")/.."
if [ ! -f Data/corpus_r4/train_union.txt ]; then
  bash tools/make_round4_ft_corpus.sh
fi
if [ ! -f Data/corpus_r4t/train_list.txt ]; then
  python tools/make_corpus.py --root Data/corpus_r4t --n 700 --n-val 40 \
    --tone-share 0.45 --sweep-share 0.10 --vibrato-share 0.10 \
    --wander-share 0.20 --steepglide-share 0.05 \
    --augment-share 0.10 --augment-weights 1,1,1,1,2,2 \
    --tone-partials-max 1 --seed 53
fi
mkdir -p Data/corpus_r4tu
cat Data/corpus_r4/train_union.txt Data/corpus_r4t/train_list.txt \
  > Data/corpus_r4tu/train_union.txt
cat Data/corpus_r4/val_union.txt Data/corpus_r4t/val_list.txt \
  > Data/corpus_r4tu/val_union.txt
echo R4-TONE-CORPUS-DONE
