#!/bin/bash
# Round-2 queue d: gates for the importance-subsampled gradient path — the
# standalone topk study (attribution) and the full composed12f8+topk
# composition (the bench operating-point gate). Waits for a prior queue pid
# (arg 1) to drain. Resumable via DONE markers.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
run() {
  local log="/tmp/ab_logs/$1"; shift
  if [ -s "$log" ] && grep -q DONE "$log"; then echo "skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" python scripts/quality_ab.py > "$log" 2>&1
  tail -n 8 "$log"
}
# The full composition at the collapse seed, then seed 0. Controls come from
# the composed12 study cells (same A config, same seeds).
run c12topk_s1.log AB_STUDY=composed12topk AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="topk24,topk16"
run c12topk_s0.log AB_STUDY=composed12topk AB_ITERS=2000 AB_SEED=0 \
    AB_VARIANTS="topk24,topk16"
# Standalone topk attribution at the default toy config, vs the measured
# base2000/hessfix exact controls (24.15 s1 / 24.04 s0).
run topk2000_s1.log AB_STUDY=topk AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="topk=16"
echo "QUEUE_R2D DONE $(date +%H:%M:%S)"
