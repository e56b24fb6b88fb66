#!/bin/bash
# Round-4 leg 3 TPU queue — BiLSTM flagship-ladder hedge, chained behind
# leg 2.  Leg A showed the reference-default BiLSTM head beating the
# transformer on 4/7 suites at equal budget (RESULTS round-4); this leg
# gives the BiLSTM the same consolidation stage the transformer got (ft1b:
# 300 epochs @1e-4 from b0_control@200) and compares the two ladders
# suite-for-suite.  Loud logging, no silent skips (ADVICE r3).
set -u
cd /root/repo
LOG=/tmp/r4leg3.log
gc() {
  local msg="$1"; shift
  flock /tmp/pex_git.lock bash -c \
    'git add -A -- "$@" >/dev/null 2>&1; git commit -q -m "$0" -- "$@" && git log --oneline -1' \
    "$msg" "$@" || true
}
step() { echo "=== [$(date +%H:%M:%S)] $*"; }

{
  step "waiting for leg-2 queue (DONE marker in /tmp/r4leg2.log)"
  while ! grep -q '^DONE' /tmp/r4leg2.log 2>/dev/null; do
    if [ -f /tmp/r4leg2.real.pid ] && ! kill -0 "$(cat /tmp/r4leg2.real.pid)" 2>/dev/null; then
      step "leg-2 process gone without DONE marker — proceeding anyway"
      break
    fi
    sleep 60
  done
  step "leg-2 done; starting leg 3 (BiLSTM ladder hedge)"

  for try in 1 2 3; do
    [ -f results/round4/flagship_ft1b/epoch_00300.ckpt ] && break
    step "train ft1b attempt $try"
    ( timeout 5400 python train.py --config_path Configs/config_r4_ft1b.yml & echo $! > /tmp/r4train3.pid; wait $! )
    rc=$?
    step "train ft1b attempt $try exited rc=$rc"
    gc "round-4 leg3: ft1b checkpoint snapshot" results/round4/flagship_ft1b
    [ "$rc" = 42 ] || sleep 20
  done

  step "suites_ft1b"
  timeout 4500 python evaluate.py \
    --checkpoint_dir results/round4/flagship_ft1b \
    --config_path Configs/config_r4_ft1b.yml \
    --suites all --eval_list Data/real_eval_list.txt \
    --output_dir results/round4/suites_ft1b \
    > results/round4/suites_ft1b_summary.json; step "suites_ft1b rc=$?"
  timeout 600 python evaluate.py \
    --compare results/round4/suites_ft1 results/round4/suites_ft1b \
    --output_dir results/round4/compare_ft1_ft1b \
    > results/round4/compare_ft1_ft1b_summary.json; step "compare rc=$?"
  gc "round-4 leg3: BiLSTM-ladder ft1b suites + transformer-vs-BiLSTM ladder compare" results/round4
} > "$LOG" 2>&1
echo DONE >> "$LOG"
