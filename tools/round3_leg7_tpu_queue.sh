#!/bin/bash
# Round-3 leg 7: second machine reset (Aug 20 01:56) killed the leg-6 queue
# and wiped Data/ + the XLA compile cache again.  The transformer A/B runs
# (t0/t1/t2) survived because they were committed; tx_b0_control was not.
# This queue rebuilds the remaining round-3 evidence inside a ~55-minute
# session budget, in priority order:
#   1. b0_control (200-epoch BiLSTM equal-budget control) — the missing half
#      of the VERDICT #5 transformer-vs-BiLSTM comparison.
#   2. bench.py once (re-warms the wiped compile cache so the driver bench
#      measures steady-state, not a cold remote compile).
#   3. Equal-budget FULL-suite comparison: suites_b0 vs suites_t1.
# The 350-epoch flagship does not fit this budget and moves to the next leg.
cd /root/repo
DEADLINE=${DEADLINE:-$(date -d "04:02" +%s)}
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }
{
  # gate on the corpus rebuild finishing
  while ! grep -q R3-CORPUS-DONE /tmp/corpus.log 2>/dev/null; do sleep 5; done
  set -x
  # quick tunnel probe (fresh boot: claim should be clean; bounded anyway)
  timeout 300 python -c "import jax; print(jax.devices()); import jax.numpy as jnp; print(jnp.ones(8).sum())"
  # 1. BiLSTM control train (auto-resume makes a timeout recoverable)
  if [ "$(left)" -gt 20 ]; then
    timeout $(( ($(left) - 16) * 60 )) python train.py \
      --config_path Configs/config_r3_b0_control.yml
  fi
  # 2. warm the driver-bench cache FIRST (the driver runs bench.py at round
  #    end; a cold compile there would eat the measurement window)
  if [ "$(left)" -gt 4 ]; then
    timeout $(( ($(left) - 1) * 60 )) python bench.py > results/round3/bench_leg7.json
  fi
  # 3. equal-budget full-suite comparison (VERDICT #5 evidence)
  if [ "$(left)" -gt 12 ]; then
    timeout $(( ($(left) - 6) * 60 )) python evaluate.py \
      --checkpoint_dir results/round3/tx_b0_control \
      --config_path Configs/config_r3_b0_control.yml \
      --suites all --output_dir results/round3/suites_b0 \
      > results/round3/suites_b0_summary.json
  fi
  if [ "$(left)" -gt 6 ]; then
    timeout $(( ($(left) - 1) * 60 )) python evaluate.py \
      --checkpoint_dir results/round3/tx_t1_warm \
      --config_path Configs/config_r3_t1_warm.yml \
      --suites all --output_dir results/round3/suites_t1 \
      > results/round3/suites_t1_summary.json
  fi
} > /tmp/r3leg7.log 2>&1
echo DONE >> /tmp/r3leg7.log
