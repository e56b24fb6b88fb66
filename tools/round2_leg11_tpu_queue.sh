#!/bin/bash
# Round-2 leg-11 TPU queue: CREPE-full self-training, then the stage-m
# room-realism fine-tune + full suites, then bench/profile refresh.
# Run detached:
#   setsid nohup bash tools/round2_leg11_tpu_queue.sh \
#       >> results/round2/leg11_queue.out 2>&1 < /dev/null &
set -x
cd /root/repo

# 1) CREPE-full labeler (tops out the reference's torchcrepe capacity
#    ladder; gate: tests/test_crepe.py test_shipped_crepe_full_full_band)
if [ ! -f weights/crepe_full.npz ]; then
  timeout 10800 python tools/train_crepe.py --capacity full --steps 6000 \
    --output weights/crepe_full.npz > results/round2/crepe_full.log 2>&1
  echo "crepe-full rc=$?"
fi

# 2) stage-m corpus (eval-matched reverb D/R), heavy reverb weighting
if [ ! -f Data/corpus_r2m/train_list.txt ]; then
  python tools/make_corpus.py --root Data/corpus_r2m --n 280 --n-val 16 \
    --tone-share 0.10 --sweep-share 0.10 --burst-share 0.05 --glide-share 0.10 \
    --vibrato-share 0.12 --wander-share 0.08 --steepglide-share 0.15 \
    --augment-share 0.45 --augment-weights 1,1,1,1,2,6 --seed 41
  cat Data/corpus_r2k/train_union.txt Data/corpus_r2m/train_list.txt \
    > Data/corpus_r2m/train_union.txt
  cat Data/corpus_r2k/val_union.txt Data/corpus_r2m/val_list.txt \
    > Data/corpus_r2m/val_union.txt
fi

# 3) stage-m fine-tune (auto-resume makes retries lossless to save_freq)
for attempt in 1 2 3; do
  [ -f results/round2/flagship_m/epoch_00200.ckpt ] && break
  timeout 9000 python train.py --config_path Configs/config_round2m.yml \
    >> results/round2/flagship_m_train.out 2>&1
  echo "flagship_m attempt $attempt rc=$?"
done

CKPT=$(ls results/round2/flagship_m/epoch_*.ckpt 2>/dev/null | sort | tail -1)
echo "flagship_m final checkpoint: $CKPT"
if [ -n "$CKPT" ]; then
  timeout 7200 python evaluate.py \
    --checkpoint "$CKPT" \
    --config_path Configs/config_round2m.yml \
    --suites all \
    --output_dir results/round2/suites_m \
    > results/round2/suites_m.log 2>&1
  echo "suites-m rc=$?"
fi

# 4) bench + profile refresh with the leg-11 kernels
timeout 3600 python bench.py > results/round2/bench_leg11.jsonl 2>results/round2/bench_leg11.err
echo "bench rc=$?"
timeout 3600 python tools/profile_step.py --outdir results/round2/trace_leg11 \
  > results/round2/profile_leg11.log 2>&1
echo "profile rc=$?"
echo "TPU-QUEUE-LEG11-DONE"
