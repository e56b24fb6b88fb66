#!/bin/bash
# Round-4 leg D TPU queue — post-reset rebuild session (the third machine
# reset wiped Data/, the XLA compile cache, and the in-flight leg-1/2/3
# queues before any flagship checkpoint landed).  One chained detached job,
# one TPU claimant at a time (CLAUDE.md).  Priorities, highest first:
#   1. BiLSTM flagship ladder (VERDICT r3 #1): ft1b (300 ep @1e-4 from the
#      committed b0_control@200 on corpus_r3) -> six suites -> ft2b (250 ep
#      @5e-5 on the degradation-weighted union corpus, the round-2 h->i/j
#      recipe compressed) -> six suites + compare.  BiLSTM is the
#      data-backed default head (leg A: won 4/7 suites at equal budget).
#   2. Driver-bench cache warm EARLY (right after ft1b) so a mid-queue
#      round end still leaves BENCH_r04 warm.
#   3. freq_pack bench A/B (VERDICT r3 #3 measurement).
#   4. Transformer ladder arm (ft1) + ladder-vs-ladder compare, best effort.
# Checkpoints are committed AS THEY LAND (newest per stage only — ADVICE r3
# checkpoint-bloat note); every step logs its exit code loudly, no silent
# deadline skips (ADVICE r3).
set -u
cd /root/repo
LOG=/tmp/r4legD.log
gc() { # gc <msg> <path...> — flock-guarded targeted commit
  local msg="$1"; shift
  flock /tmp/pex_git.lock bash -c \
    'git add -A -- "$@" >/dev/null 2>&1; git commit -q -m "$0" -- "$@" && git log --oneline -1' \
    "$msg" "$@" || true
}
step() { echo "=== [$(date +%H:%M:%S)] $*"; }

commit_newest_ckpt() { # commit_newest_ckpt <logdir> <msg> — newest ckpt only
  local d="$1" msg="$2" newest
  newest=$(ls -t "$d"/epoch_*.ckpt 2>/dev/null | head -1) || true
  [ -n "${newest:-}" ] || return 0
  gc "$msg" "$newest" "$newest.json" "$d"/config_*.yml "$d"/train.log
}

train_stage() { # train_stage <config> <logdir> <final_ckpt> <per_try_timeout_s> <msg>
  local cfg="$1" logdir="$2" final="$3" tmo="$4" msg="$5" try rc
  for try in 1 2 3 4; do
    if [ -f "$logdir/$final" ]; then break; fi
    step "train $cfg attempt $try"
    ( timeout "$tmo" python train.py --config_path "$cfg" & echo $! > /tmp/r4train.pid; wait $! )
    rc=$?
    step "train $cfg attempt $try exited rc=$rc"
    commit_newest_ckpt "$logdir" "$msg (attempt $try, rc=$rc)"
    [ "$rc" = 42 ] || sleep 30
  done
  if [ -f "$logdir/$final" ]; then step "stage $logdir COMPLETE"; else step "stage $logdir FAILED (no $final)"; fi
}

run_suites() { # run_suites <ckpt_dir> <cfg> <outtag> <msg>
  local d="$1" cfg="$2" tag="$3" msg="$4"
  step "suites_$tag"
  timeout 4500 python evaluate.py \
    --checkpoint_dir "$d" \
    --config_path "$cfg" \
    --suites all --eval_list Data/real_eval_list.txt \
    --output_dir "results/round4/suites_$tag" \
    > "results/round4/suites_${tag}_summary.json"; step "suites_$tag rc=$?"
  gc "$msg" "results/round4/suites_$tag" "results/round4/suites_${tag}_summary.json"
}

{
  step "corpora (CPU, before any TPU claim)"
  timeout 2400 bash tools/make_round3_corpus.sh; step "corpus_r3 rc=$?"
  timeout 2400 bash tools/make_round4_ft_corpus.sh; step "corpus_r4 rc=$?"
  head -20 Data/corpus_r3/val_list.txt > Data/real_eval_list.txt 2>/dev/null || true
  mkdir -p results/round4

  step "probe tunnel"
  for i in 1 2 3 4 5 6; do
    timeout 300 python -c "import jax; print(jax.devices()); import jax.numpy as jnp; print(jnp.ones(8).sum())" && break
    step "probe $i failed; retry in 60s"; sleep 60
  done

  # ---- 1a. BiLSTM ft1b ----
  train_stage Configs/config_r4_ft1b.yml results/round4/flagship_ft1b epoch_00300.ckpt 5400 \
    "round-4 flagship ladder ft1b (BiLSTM consolidation) checkpoint"
  run_suites results/round4/flagship_ft1b Configs/config_r4_ft1b.yml ft1b \
    "Flagship ft1b suites (BiLSTM 300-epoch consolidation from b0_control)"

  # ---- 2. warm the driver bench (same BiLSTM B=64 T=192 program family) ----
  step "bench warm (default config)"
  timeout 3600 python bench.py > results/round4/bench_legD1.json; step "bench rc=$?"
  gc "round-4 legD bench warm (post-ft1b)" results/round4/bench_legD1.json bench_details.json

  # ---- 1b. BiLSTM ft2b on the degradation-weighted union ----
  train_stage Configs/config_r4_ft2b.yml results/round4/flagship_ft2b epoch_00250.ckpt 5400 \
    "round-4 flagship ladder ft2b (union fine-tune) checkpoint"
  run_suites results/round4/flagship_ft2b Configs/config_r4_ft2b.yml flagship \
    "Round-4 flagship (ft2b) six suites"
  timeout 600 python evaluate.py \
    --compare results/round4/suites_ft1b results/round4/suites_flagship \
    --output_dir results/round4/compare_ft1b_ft2b \
    > results/round4/compare_ft1b_ft2b_summary.json; step "compare ft1b-ft2b rc=$?"
  gc "Flagship ladder compare ft1b vs ft2b" results/round4/compare_ft1b_ft2b results/round4/compare_ft1b_ft2b_summary.json

  # ---- 3. freq_pack bench A/B (VERDICT r3 #3) ----
  for i in 1 2; do
    step "bench default trunk (run $i)"
    timeout 2400 python bench.py > results/round4/bench_fp0_$i.json; step "rc=$?"
    step "bench freq_pack trunk (run $i) — first run pays the packed compile"
    PEX_FREQ_PACK=1 timeout 4800 python bench.py > results/round4/bench_fp1_$i.json; step "rc=$?"
  done
  gc "round-4 legD: freq_pack bench A/B" results/round4/bench_fp0_1.json results/round4/bench_fp0_2.json results/round4/bench_fp1_1.json results/round4/bench_fp1_2.json bench_details.json

  # ---- 4. transformer ladder arm, best effort ----
  train_stage Configs/config_r4_ft1.yml results/round4/flagship_ft1 epoch_00300.ckpt 5400 \
    "round-4 flagship ladder ft1 (transformer consolidation) checkpoint"
  run_suites results/round4/flagship_ft1 Configs/config_r4_ft1.yml ft1 \
    "Flagship ft1 suites (transformer 300-epoch consolidation)"
  timeout 600 python evaluate.py \
    --compare results/round4/suites_ft1 results/round4/suites_ft1b \
    --output_dir results/round4/compare_ft1_ft1b \
    > results/round4/compare_ft1_ft1b_summary.json; step "compare ft1-ft1b rc=$?"
  gc "Ladder-vs-ladder compare (transformer ft1 vs BiLSTM ft1b)" results/round4/compare_ft1_ft1b results/round4/compare_ft1_ft1b_summary.json

  # ---- leave the driver bench warm on the default config ----
  step "final default bench"
  timeout 2400 python bench.py > results/round4/bench_legD_final.json; step "rc=$?"
  gc "round-4 legD final bench" results/round4/bench_legD_final.json bench_details.json
} > "$LOG" 2>&1
echo DONE >> "$LOG"
