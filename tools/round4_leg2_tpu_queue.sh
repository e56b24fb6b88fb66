#!/bin/bash
# Round-4 leg 2 TPU queue — chained behind leg 1 (one TPU claimant at a
# time, CLAUDE.md).  Work items, in priority order:
#   A. freq_pack bench A/B (VERDICT r3 #3): default trunk vs the
#      lane-native packed trunk (PEX_FREQ_PACK=1), two bench runs each,
#      same driver protocol.
#   B. Speech-corpus A/B (VERDICT r3 #8): sp0 (corpus_r3 control) vs sp1
#      (25% speech-like class), identical 80-epoch BiLSTM recipe; both
#      scored on the speech-only held-out list (real_audio cascade-as-
#      oracle) + dynamic_pitch/noise regression checks.
#   C. B=256 large-batch flagship validation (VERDICT r3 #5): 50-epoch
#      warm-started run from ft1; sustained utt/s + convergence gate.
#   D. Final default-config bench to leave the driver-bench cache warm.
# No silent deadline skips (ADVICE r3): every step logs its exit code; if
# the round ends mid-queue the driver sees exactly which steps ran.
set -u
cd /root/repo
LOG=/tmp/r4leg2.log
gc() {
  local msg="$1"; shift
  flock /tmp/pex_git.lock bash -c \
    'git add -A -- "$@" >/dev/null 2>&1; git commit -q -m "$0" -- "$@" && git log --oneline -1' \
    "$msg" "$@" || true
}
step() { echo "=== [$(date +%H:%M:%S)] $*"; }

train_stage() { # train_stage <config> <logdir> <final_ckpt> <per_try_timeout_s>
  local cfg="$1" logdir="$2" final="$3" tmo="$4" try rc
  for try in 1 2 3; do
    if [ -f "$logdir/$final" ]; then break; fi
    step "train $cfg attempt $try"
    ( timeout "$tmo" python train.py --config_path "$cfg" & echo $! > /tmp/r4train2.pid; wait $! )
    rc=$?
    step "train $cfg attempt $try exited rc=$rc"
    gc "round-4 leg2: checkpoint snapshot ($logdir)" "$logdir"
    [ "$rc" = 42 ] || sleep 20
  done
  if [ -f "$logdir/$final" ]; then step "stage $logdir COMPLETE"; else step "stage $logdir FAILED (no $final)"; fi
}

{
  step "waiting for leg-1 queue to finish (DONE marker in /tmp/r4leg1.log)"
  while ! grep -q '^DONE' /tmp/r4leg1.log 2>/dev/null; do
    # if the leg-1 process died without the marker, bail out of the gate
    # (liveness by PID file, never by command-line pattern)
    if [ -f /tmp/r4leg1.real.pid ] && ! kill -0 "$(cat /tmp/r4leg1.real.pid)" 2>/dev/null; then
      step "leg-1 process gone without DONE marker — proceeding anyway"
      break
    fi
    sleep 60
  done
  step "leg-1 done; starting leg 2"
  mkdir -p results/round4

  # ---- A: freq_pack bench A/B ----
  for i in 1 2; do
    step "bench default trunk (run $i)"
    timeout 2400 python bench.py > results/round4/bench_fp0_$i.json; step "rc=$?"
    step "bench freq_pack trunk (run $i)"
    # first run pays the packed program's remote compile (ft1's train-step
    # compile took 41 min post-cache-wipe) — budget accordingly
    PEX_FREQ_PACK=1 timeout 4800 python bench.py > results/round4/bench_fp1_$i.json; step "rc=$?"
  done
  gc "round-4 leg2: freq_pack bench A/B" results/round4/bench_fp0_1.json results/round4/bench_fp0_2.json results/round4/bench_fp1_1.json results/round4/bench_fp1_2.json bench_details.json

  # ---- B: speech-corpus A/B ----
  step "speech corpora"
  timeout 1800 bash tools/make_round4_speech_corpus.sh; step "corpus rc=$?"
  head -24 Data/corpus_r4seval/val_list.txt > Data/speech_eval_list.txt 2>/dev/null || true

  train_stage Configs/config_r4_sp0.yml results/round4/sp0 epoch_00080.ckpt 3600
  train_stage Configs/config_r4_sp1.yml results/round4/sp1 epoch_00080.ckpt 3600

  for tag in sp0 sp1; do
    step "suites_$tag (speech-eval real_audio + regression suites)"
    timeout 3600 python evaluate.py \
      --checkpoint_dir results/round4/$tag \
      --config_path Configs/config_r4_$tag.yml \
      --suites real_audio,dynamic_pitch,noise \
      --eval_list Data/speech_eval_list.txt \
      --output_dir results/round4/suites_$tag \
      > results/round4/suites_${tag}_summary.json; step "suites_$tag rc=$?"
  done
  timeout 600 python evaluate.py \
    --compare results/round4/suites_sp0 results/round4/suites_sp1 \
    --output_dir results/round4/compare_sp0_sp1 \
    > results/round4/compare_sp0_sp1_summary.json; step "compare rc=$?"
  gc "round-4 leg2: speech-corpus A/B (sp0 vs sp1) suites + compare" results/round4

  # ---- C: B=256 validation ----
  train_stage Configs/config_r4_b256.yml results/round4/b256 epoch_00050.ckpt 4500
  gc "round-4 leg2: B=256 large-batch validation run" results/round4/b256

  # ---- D: leave the driver-bench cache warm on the default config ----
  step "final default bench"
  timeout 2400 python bench.py > results/round4/bench_leg2_final.json; step "rc=$?"
  gc "round-4 leg2: final bench" results/round4/bench_leg2_final.json bench_details.json
} > "$LOG" 2>&1
echo DONE >> "$LOG"
