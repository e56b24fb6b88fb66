#!/bin/bash
# Full-suite pytest inside the round (VERDICT r3 #10), launched detached and
# gated on the ft1b trainer finishing its cache warm-up: the host has ONE
# core, so pytest must not compete with the label warm-up's host feed, but
# the long post-reset remote compile that follows warm-up leaves the host
# idle — that's the window this gate targets.  Runs unconditionally once the
# gate opens or the 90-min wait expires (if the trainer died, the host is
# free anyway).
set -u
cd /root/repo
LOG=/tmp/r4pytest.log
{
  for i in $(seq 1 90); do
    grep -q "cache warm-up took" results/round4/flagship_ft1b/train.log 2>/dev/null && break
    sleep 60
  done
  echo "=== starting full pytest at $(date +%H:%M:%S)"
  nice -n 19 python -m pytest tests/ -q 2>&1 | tail -40
  echo "=== pytest finished at $(date +%H:%M:%S)"
} > "$LOG" 2>&1
echo DONE >> "$LOG"
