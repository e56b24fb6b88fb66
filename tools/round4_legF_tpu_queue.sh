#!/bin/bash
# Round-4 leg F TPU queue — post-FOURTH-reset session.  The reset wiped
# Data/, /tmp (leg D/E queues), and the persistent XLA compile cache, so the
# highest-value ordering changes: the driver-bench cache warm comes FIRST
# (BENCH_r04 would otherwise measure cold remote compiles), then the leg-E
# evidence items in value order, then the ft3b train as best-effort tail.
# One TPU claimant at a time (CLAUDE.md); bounded gates (ADVICE r3).
set -u
cd /root/repo
LOG=/tmp/r4legF.log
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

{
  # ---- 0: bounded corpus gate (corpus job launched by the session) ----
  for i in $(seq 1 40); do
    grep -q CORPUS-ALL-DONE /tmp/corpus_r4.log 2>/dev/null && break
    step "waiting for corpus ($i/40)"; sleep 15
  done
  if ! grep -q CORPUS-ALL-DONE /tmp/corpus_r4.log 2>/dev/null; then
    step "corpus gate TIMED OUT — continuing with whatever exists (suites need only real_eval_list)"
  fi
  [ -f Data/real_eval_list.txt ] || head -20 Data/corpus_r3/val_list.txt > Data/real_eval_list.txt 2>/dev/null || true
  mkdir -p results/round4

  step "probe tunnel"
  for i in 1 2 3 4 5 6; do
    timeout 300 python -c "import jax; print(jax.devices()); import jax.numpy as jnp; print(jnp.ones(8).sum())" && break
    step "probe $i failed; retry in 60s"; sleep 60
  done

  # ---- 1: driver-bench cache warm (highest priority post-reset) ----
  step "bench warm (cold compile expected)"
  timeout 2700 python bench.py > results/round4/bench_legF1.json; step "bench rc=$?"
  cat results/round4/bench_legF1.json
  gc "round-4 legF: post-reset bench cache warm" \
    results/round4/bench_legF1.json bench_details.json

  # ---- 2: ft1b suites under the EXACT renderer (same-renderer ladder compare) ----
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
  gc "round-4 legF: ft1b suites under the exact renderer + same-renderer ladder compare" \
    results/round4/suites_ft1b_v2 results/round4/suites_ft1b_v2_summary.json \
    results/round4/compare_ft1b_ft2b_v2 results/round4/compare_ft1b_ft2b_v2_summary.json

  # ---- 3: cross-day eval-context probe (b0 codec suite recheck) ----
  step "suites_b0_recheck (codec_bandwidth only)"
  timeout 1800 python evaluate.py \
    --checkpoint_dir results/round3/tx_b0_control \
    --config_path Configs/config_r3_b0_control.yml \
    --suites codec_bandwidth \
    --output_dir results/round4/suites_b0_recheck \
    > results/round4/suites_b0_recheck_summary.json; step "recheck rc=$?"
  gc "round-4 legF: b0 codec-suite recheck (cross-day eval-context probe)" \
    results/round4/suites_b0_recheck results/round4/suites_b0_recheck_summary.json

  # ---- 4: ft3b pure-sine-targeted fine-tune (best-effort tail) ----
  # Commit the newest checkpoint after every attempt; suites only if the
  # stage completes inside the round.
  for try in 1 2 3; do
    [ -f results/round4/flagship_ft3b/epoch_00200.ckpt ] && break
    step "train ft3b attempt $try"
    ( timeout 5400 python train.py --config_path Configs/config_r4_ft3b.yml & \
      echo $! > /tmp/r4trainF.pid; wait $! )
    rc=$?
    step "train ft3b attempt $try exited rc=$rc"
    commit_newest_ckpt results/round4/flagship_ft3b \
      "round-4 flagship ladder ft3b (pure-sine-targeted) checkpoint (attempt $try, rc=$rc)"
    [ "$rc" = 42 ] || sleep 20
  done
  if [ -f results/round4/flagship_ft3b/epoch_00200.ckpt ]; then
    step "suites_ft3b"
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
    gc "round-4 legF: ft3b suites + ft2b-vs-ft3b compare" \
      results/round4/suites_ft3b results/round4/suites_ft3b_summary.json \
      results/round4/compare_ft2b_ft3b results/round4/compare_ft2b_ft3b_summary.json
  fi
} > "$LOG" 2>&1
echo DONE >> "$LOG"
