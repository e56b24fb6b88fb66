#!/bin/bash
# Round-4 leg E TPU queue — chained behind leg D (one TPU claimant at a
# time, CLAUDE.md).  The remaining round-4 evidence items:
#   A. Speech-corpus A/B (VERDICT r3 #8): sp0 (corpus_r3 control) vs sp1
#      (25% speech-like class), identical 80-epoch BiLSTM recipe, scored on
#      the speech-only held-out list + regression suites.
#   B. B=256 large-batch flagship validation (VERDICT r3 #5): sustained
#      utt/s + convergence.
#   C. Final default-config bench to leave the driver-bench cache warm.
set -u
cd /root/repo
LOG=/tmp/r4legE.log
gc() {
  local msg="$1"; shift
  flock /tmp/pex_git.lock bash -c \
    'git add -A -- "$@" >/dev/null 2>&1; git commit -q -m "$0" -- "$@" && git log --oneline -1' \
    "$msg" "$@" || true
}
step() { echo "=== [$(date +%H:%M:%S)] $*"; }

commit_newest_ckpt() {
  local d="$1" msg="$2" newest
  newest=$(ls -t "$d"/epoch_*.ckpt 2>/dev/null | head -1) || true
  [ -n "${newest:-}" ] || return 0
  gc "$msg" "$newest" "$newest.json" "$d"/config_*.yml "$d"/train.log
}

train_stage() {
  local cfg="$1" logdir="$2" final="$3" tmo="$4" msg="$5" try rc
  for try in 1 2 3; do
    if [ -f "$logdir/$final" ]; then break; fi
    step "train $cfg attempt $try"
    ( timeout "$tmo" python train.py --config_path "$cfg" & echo $! > /tmp/r4trainE.pid; wait $! )
    rc=$?
    step "train $cfg attempt $try exited rc=$rc"
    commit_newest_ckpt "$logdir" "$msg (attempt $try, rc=$rc)"
    [ "$rc" = 42 ] || sleep 20
  done
  if [ -f "$logdir/$final" ]; then step "stage $logdir COMPLETE"; else step "stage $logdir FAILED (no $final)"; fi
}

{
  step "waiting for leg-D queue (DONE marker in /tmp/r4legD.log)"
  while ! grep -q '^DONE' /tmp/r4legD.log 2>/dev/null; do
    if [ -f /tmp/r4legD.real.pid ] && ! kill -0 "$(cat /tmp/r4legD.real.pid)" 2>/dev/null; then
      step "leg-D process gone without DONE marker — proceeding anyway"
      break
    fi
    sleep 60
  done
  step "leg-D done; starting leg E"
  mkdir -p results/round4

  # ---- 0: cross-day eval-context probe ----
  # Leg A recorded b0 codec_bandwidth baseline RPA 0.9752; the same
  # checkpoint + same code scores ~0.61 on the post-reset environment (CPU
  # and TPU agree).  Re-run the one suite on the committed b0 checkpoint to
  # pin down whether the tunnel service update changed eval numerics
  # (RESULTS round-4 leg D writeup depends on this attribution).
  step "suites_b0_recheck (codec_bandwidth only)"
  timeout 1800 python evaluate.py \
    --checkpoint_dir results/round3/tx_b0_control \
    --config_path Configs/config_r3_b0_control.yml \
    --suites codec_bandwidth \
    --output_dir results/round4/suites_b0_recheck \
    > results/round4/suites_b0_recheck_summary.json; step "recheck rc=$?"
  gc "round-4 legE: b0 codec-suite recheck (cross-day eval-context probe)" \
    results/round4/suites_b0_recheck results/round4/suites_b0_recheck_summary.json

  # ---- 0b: ft1b suites under the EXACT renderer ----
  # suites_ft1b ran before the exact-stimulus fix (a9057b7) while
  # suites_flagship runs after it; re-run ft1b so the ladder compare is
  # same-renderer on both sides.
  step "suites_ft1b_v2 (exact renderer)"
  timeout 4500 python evaluate.py \
    --checkpoint_dir results/round4/flagship_ft1b \
    --config_path Configs/config_r4_ft1b.yml \
    --suites all --eval_list Data/real_eval_list.txt \
    --output_dir results/round4/suites_ft1b_v2 \
    > results/round4/suites_ft1b_v2_summary.json; step "suites_ft1b_v2 rc=$?"
  timeout 600 python evaluate.py \
    --compare results/round4/suites_ft1b_v2 results/round4/suites_flagship \
    --output_dir results/round4/compare_ft1b_ft2b_v2 \
    > results/round4/compare_ft1b_ft2b_v2_summary.json; step "compare v2 rc=$?"
  gc "round-4 legE: ft1b suites re-run under the exact renderer + same-renderer ladder compare" \
    results/round4/suites_ft1b_v2 results/round4/suites_ft1b_v2_summary.json \
    results/round4/compare_ft1b_ft2b_v2 results/round4/compare_ft1b_ft2b_v2_summary.json

  # ---- 0c: ft3b pure-sine-targeted fine-tune ----
  # The exact-renderer tone map (RESULTS leg D) shows +60-220 cent band
  # holes on single-partial sines — the suites' stimulus regime but ~4.5%
  # of the corpus.  Round-2's stage-k recipe (add the missing class,
  # fine-tune, re-suite) applied to the round-4 ladder.
  step "tone corpus"
  timeout 1800 bash tools/make_round4_tone_corpus.sh; step "tone corpus rc=$?"
  train_stage Configs/config_r4_ft3b.yml results/round4/flagship_ft3b epoch_00200.ckpt 4500 \
    "round-4 flagship ladder ft3b (pure-sine-targeted) checkpoint"
  run_suites_ft3b() {
    timeout 4500 python evaluate.py \
      --checkpoint_dir results/round4/flagship_ft3b \
      --config_path Configs/config_r4_ft3b.yml \
      --suites all --eval_list Data/real_eval_list.txt \
      --output_dir results/round4/suites_ft3b \
      > results/round4/suites_ft3b_summary.json; step "suites_ft3b rc=$?"
    timeout 600 python evaluate.py \
      --compare results/round4/suites_flagship results/round4/suites_ft3b \
      --output_dir results/round4/compare_ft2b_ft3b \
      > results/round4/compare_ft2b_ft3b_summary.json; step "compare ft2b-ft3b rc=$?"
  }
  step "suites_ft3b"
  run_suites_ft3b
  gc "round-4 legE: ft3b suites + ft2b-vs-ft3b compare" \
    results/round4/suites_ft3b results/round4/suites_ft3b_summary.json \
    results/round4/compare_ft2b_ft3b results/round4/compare_ft2b_ft3b_summary.json

  # ---- A: speech-corpus A/B ----
  step "speech corpora"
  timeout 1800 bash tools/make_round4_speech_corpus.sh; step "corpus rc=$?"
  head -24 Data/corpus_r4seval/val_list.txt > Data/speech_eval_list.txt 2>/dev/null || true

  train_stage Configs/config_r4_sp0.yml results/round4/sp0 epoch_00080.ckpt 3600 \
    "round-4 legE: sp0 control checkpoint"
  train_stage Configs/config_r4_sp1.yml results/round4/sp1 epoch_00080.ckpt 3600 \
    "round-4 legE: sp1 speech-class checkpoint"

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
  gc "round-4 legE: speech-corpus A/B (sp0 vs sp1) suites + compare" results/round4

  # ---- B: B=256 validation ----
  # warm start prefers the legD transformer-arm ft1 checkpoint; fall back to
  # the committed round-3 t1_warm if that arm didn't land
  B256_CFG=Configs/config_r4_b256.yml
  if [ ! -f results/round4/flagship_ft1/epoch_00300.ckpt ]; then
    step "ft1@300 missing — b256 falls back to tx_t1_warm@200"
    sed 's#results/round4/flagship_ft1/epoch_00300.ckpt#results/round3/tx_t1_warm/epoch_00200.ckpt#' \
      Configs/config_r4_b256.yml > /tmp/config_r4_b256_fallback.yml
    B256_CFG=/tmp/config_r4_b256_fallback.yml
  fi
  train_stage "$B256_CFG" results/round4/b256 epoch_00050.ckpt 4500 \
    "round-4 legE: B=256 large-batch validation checkpoint"
  gc "round-4 legE: B=256 large-batch validation run" results/round4/b256

  # ---- C: leave the driver bench warm on the default config ----
  step "final default bench"
  timeout 2400 python bench.py > results/round4/bench_legE_final.json; step "rc=$?"
  gc "round-4 legE: final bench" results/round4/bench_legE_final.json bench_details.json
} > "$LOG" 2>&1
echo DONE >> "$LOG"
