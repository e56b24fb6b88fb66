#!/bin/bash
# Parity phases 3+4 end-to-end on CPU, resumable at every stage.
#
# The environment reset wiped results/round2/parity_data and the run dirs
# (gitignored), so this regenerates phase 3 from its fixed seeds and then
# runs the phase-4 extension (warm-start from phase 3, replay the batches3
# stream x4 under a fresh half-peak OneCycle) on both stacks.  Run detached:
#   setsid nohup bash tools/round2_parity_chain.sh \
#       >> results/round2/parity_chain.out 2>&1 < /dev/null &
set -ex
cd "$(dirname "$0")/.."

R=results/round2/parity_data
TO=results/round2/torch_run
JO=results/round2/jax_run

if [ ! -f "$R/meta3.json" ]; then
  python tools/parity_experiment.py gen --root "$R" --phase 3
fi
[ -f "$TO/model3.pth" ]  || python tools/parity_experiment.py train-torch --root "$R" --out "$TO" --phase 3
[ -f "$JO/model3.ckpt" ] || python tools/parity_experiment.py train-jax   --root "$R" --out "$JO" --phase 3
[ -f "$TO/model4.pth" ]  || python tools/parity_experiment.py train-torch --root "$R" --out "$TO" --phase 4
[ -f "$JO/model4.ckpt" ] || python tools/parity_experiment.py train-jax   --root "$R" --out "$JO" --phase 4
python tools/parity_experiment.py evaluate --root "$R" --torch-run "$TO" \
  --jax-run "$JO" --csv results/round2/parity_phase4.csv --phase 4
echo PARITY-CHAIN-DONE
