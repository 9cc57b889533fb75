#!/bin/bash
# Round-2 queue e: cells lost to the mid-run worker fault plus the deferred
# non-decisive tail. Waits on a prior queue pid (arg 1). Resumable.
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
# Lost to the worker fault: the L12 candidate at seed 1 (control already
# measured: 23.98).
run lvl12_2000_s1_D.log AB_STUDY=lvl12 AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="D:"
# Deferred non-decisive tail (were marked DONE in their original logs to
# unblock the decisive cells).
run nolf2000_s0_b.log AB_STUDY=headline AB_ITERS=2000 AB_SEED=0 \
    AB_VARIANTS="nolf"
run hessfix2000_s2_b.log AB_STUDY=hessfix AB_ITERS=2000 AB_SEED=2 \
    AB_VARIANTS="exact (shared=0),hess=exact f=0.25"
run prodshape2000_s1_b.log AB_STUDY=prodshape AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="A:,B:"
echo "QUEUE_R2E DONE $(date +%H:%M:%S)"
