#!/bin/bash
# Round-3 leg 2: A/B the time-major + dir-DMA kernel changes on chip.
cd /root/repo
set -x
{
  # (a) time-major only (dir-DMA off)
  PEX_LSTM_DIRDMA=0 timeout 1800 python bench.py > results/round3/bench_leg2_tmajor.json
  # (b) time-major + dir-DMA (new default)
  timeout 1800 python bench.py > results/round3/bench_leg2_dirdma.json
  # (c) repeat (a) and (b) once for tunnel-drift control
  PEX_LSTM_DIRDMA=0 timeout 1200 python bench.py > results/round3/bench_leg2_tmajor2.json
  timeout 1200 python bench.py > results/round3/bench_leg2_dirdma2.json
  # (d) fresh trace with the winner (default config)
  timeout 1800 python tools/profile_step.py --steps 12 --out results/round3/trace_leg2
} > /tmp/r3leg2.log 2>&1
echo DONE >> /tmp/r3leg2.log
