#!/bin/bash
# Round-4 speech-corpus A/B materials (VERDICT r3 #8).
#   corpus_r4s     — the r3 recipe with 25% speech-like utterances folded in
#                    (consonant bursts, breathiness, coarticulated formant
#                    motion, jitter/shimmer AM; tools/make_corpus.py
#                    _speech_utterance), other shares scaled by 0.75.
#   corpus_r4seval — 24 speech-only utterances: the held-out "real-ish"
#                    domain both A/B arms are scored on (real_audio suite,
#                    cascade-as-oracle).
# Idempotent; Data/ is gitignored — this script is the source of truth.
set -ex
cd "$(dirname "$0")/.."
if [ ! -f Data/corpus_r4s/train_list.txt ]; then
  python tools/make_corpus.py --root Data/corpus_r4s --n 1600 --n-val 80 \
    --tone-share 0.135 --sweep-share 0.1125 --burst-share 0.0375 \
    --glide-share 0.06 --vibrato-share 0.15 --wander-share 0.09 \
    --steepglide-share 0.0525 --speech-share 0.25 \
    --augment-share 0.15 --augment-weights 1,1,1,1,2,2 --seed 41
fi
if [ ! -f Data/corpus_r4seval/train_list.txt ]; then
  python tools/make_corpus.py --root Data/corpus_r4seval --n 4 --n-val 24 \
    --tone-share 0.0 --speech-share 1.0 --seed 43
fi
echo R4-SPEECH-CORPUS-DONE
