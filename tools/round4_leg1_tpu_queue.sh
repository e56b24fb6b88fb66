#!/bin/bash
# Round-4 leg 1 TPU queue — runs the round's two headline evidence items
# in one chained detached job (one TPU claimant at a time, CLAUDE.md):
#   A. Equal-budget six-suite comparison b0 (BiLSTM) vs t1 (transformer)
#      from the COMMITTED round-3 checkpoints (VERDICT r3 #2), plus the
#      --compare diff table.
#   B. Round-4 flagship ladder (VERDICT r3 #1): warm-start the committed
#      equal-budget winner tx_t1_warm@200ep, ft1 300 epochs @1e-4 on
#      corpus_r3, then ft2 250 epochs @5e-5 on the degradation-weighted
#      union corpus (round-2 g->h->i ladder recipe, compressed).  Suites
#      after each stage; checkpoints committed AS THEY LAND (two machine
#      resets destroyed uncommitted round-3 artifacts).
# Unlike the round-3 queues there is NO wall-clock deadline that silently
# skips steps (ADVICE r3): every step has an explicit timeout and logs its
# exit code loudly.  All git operations take /tmp/pex_git.lock so the
# interactive session can commit concurrently.
set -u
cd /root/repo
LOG=/tmp/r4leg1.log
gc() { # gc <msg> <path...> — flock-guarded targeted commit
  local msg="$1"; shift
  flock /tmp/pex_git.lock bash -c \
    'git add -A -- "$@" >/dev/null 2>&1; git commit -q -m "$0" -- "$@" && git log --oneline -1' \
    "$msg" "$@" || true
}
step() { echo "=== [$(date +%H:%M:%S)] $*"; }

commit_new_ckpts() { # commit any not-yet-committed round-4 checkpoints
  local d
  for d in results/round4/flagship_ft1 results/round4/flagship_ft2; do
    [ -d "$d" ] || continue
    gc "round-4 flagship: checkpoint snapshot ($d)" "$d"/epoch_*.ckpt "$d"/epoch_*.ckpt.json "$d"/config_*.yml
  done
}

train_stage() { # train_stage <config> <logdir> <final_ckpt> <per_try_timeout_s>
  local cfg="$1" logdir="$2" final="$3" tmo="$4" try rc
  for try in 1 2 3 4 5 6; do
    if [ -f "$logdir/$final" ]; then break; fi
    step "train $cfg attempt $try"
    ( timeout "$tmo" python train.py --config_path "$cfg" & echo $! > /tmp/r4train.pid; wait $! )
    rc=$?
    step "train $cfg attempt $try exited rc=$rc"
    commit_new_ckpts
    # rc=42 is the RSS guard's checkpoint-and-restart contract; anything
    # else gets a short backoff for the tunnel claim to clear.
    [ "$rc" = 42 ] || sleep 30
  done
  if [ -f "$logdir/$final" ]; then step "stage $logdir COMPLETE"; else step "stage $logdir FAILED (no $final)"; fi
}

{
  step "probe tunnel"
  for i in 1 2 3 4 5 6; do
    timeout 300 python -c "import jax; print(jax.devices()); import jax.numpy as jnp; print(jnp.ones(8).sum())" && break
    step "probe $i failed; retry in 60s"; sleep 60
  done

  mkdir -p results/round4
  head -20 Data/corpus_r3/val_list.txt > Data/real_eval_list.txt 2>/dev/null || true

  # ---- Phase A: equal-budget six-suite comparison (VERDICT r3 #2) ----
  step "suites_b0 (BiLSTM control, committed epoch_00200)"
  timeout 4500 python evaluate.py \
    --checkpoint_dir results/round3/tx_b0_control \
    --config_path Configs/config_r3_b0_control.yml \
    --suites all --eval_list Data/real_eval_list.txt \
    --output_dir results/round4/suites_b0 \
    > results/round4/suites_b0_summary.json; step "suites_b0 rc=$?"
  gc "Equal-budget six-suite eval: BiLSTM control (b0)" results/round4

  step "suites_t1 (transformer winner, committed epoch_00200)"
  timeout 4500 python evaluate.py \
    --checkpoint_dir results/round3/tx_t1_warm \
    --config_path Configs/config_r3_t1_warm.yml \
    --suites all --eval_list Data/real_eval_list.txt \
    --output_dir results/round4/suites_t1 \
    > results/round4/suites_t1_summary.json; step "suites_t1 rc=$?"

  step "compare b0 vs t1"
  timeout 600 python evaluate.py \
    --compare results/round4/suites_b0 results/round4/suites_t1 \
    --output_dir results/round4/compare_b0_t1 \
    > results/round4/compare_b0_t1_summary.json; step "compare rc=$?"
  gc "Equal-budget six-suite eval: transformer (t1) + b0-vs-t1 compare table" results/round4

  # ---- Phase B: flagship ladder ----
  step "flagship ft1 (300 epochs @1e-4 from tx_t1_warm@200)"
  train_stage Configs/config_r4_ft1.yml results/round4/flagship_ft1 epoch_00300.ckpt 5400

  step "suites_ft1"
  timeout 4500 python evaluate.py \
    --checkpoint_dir results/round4/flagship_ft1 \
    --config_path Configs/config_r4_ft1.yml \
    --suites all --eval_list Data/real_eval_list.txt \
    --output_dir results/round4/suites_ft1 \
    > results/round4/suites_ft1_summary.json; step "suites_ft1 rc=$?"
  gc "Flagship ft1 suites (300-epoch consolidation from tx_t1_warm)" results/round4

  step "ft2 corpus"
  timeout 1200 bash tools/make_round4_ft_corpus.sh; step "corpus rc=$?"

  step "flagship ft2 (250 epochs @5e-5 on union corpus)"
  train_stage Configs/config_r4_ft2.yml results/round4/flagship_ft2 epoch_00250.ckpt 5400

  step "suites_flagship (ft2, all + real_audio)"
  timeout 4500 python evaluate.py \
    --checkpoint_dir results/round4/flagship_ft2 \
    --config_path Configs/config_r4_ft2.yml \
    --suites all --eval_list Data/real_eval_list.txt \
    --output_dir results/round4/suites_flagship \
    > results/round4/suites_flagship_summary.json; step "suites_flagship rc=$?"
  timeout 600 python evaluate.py \
    --compare results/round4/suites_ft1 results/round4/suites_flagship \
    --output_dir results/round4/compare_ft1_ft2 \
    > results/round4/compare_ft1_ft2_summary.json; step "compare ft rc=$?"
  gc "Flagship ft2 (round-4 flagship) suites + ft1-vs-ft2 compare" results/round4

  # ---- warm the driver-bench compile cache ----
  step "bench warm"
  timeout 2400 python bench.py > results/round4/bench_leg1.json; step "bench rc=$?"
  gc "round-4 leg-1 bench warm" results/round4/bench_leg1.json
} > "$LOG" 2>&1
echo DONE >> "$LOG"
