#!/bin/bash
# Round-3 corpus: one comprehensive mix covering all stimulus classes the
# round-2 stage ladder accumulated (tones, sweeps, bursts, glides, vibrato,
# wander, steep glides) plus the degradation augmenter weighted toward the
# pink-noise/reverb families the suites probe.  Data/ is gitignored; this
# script is the reproducible source of truth.
set -ex
cd "$(dirname "$0")/.."
python tools/make_corpus.py --root Data/corpus_r3 --n 1600 --n-val 80 \
  --tone-share 0.18 --sweep-share 0.15 --burst-share 0.05 --glide-share 0.08 \
  --vibrato-share 0.20 --wander-share 0.12 --steepglide-share 0.07 \
  --augment-share 0.15 --augment-weights 1,1,1,1,2,2 --seed 31
echo R3-CORPUS-DONE
