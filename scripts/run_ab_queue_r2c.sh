#!/bin/bash
# Round-2 follow-up queue: gates for the composed12 / composed12f8 candidates
# (L12 level cut composed with the stencil+exact-hessian fast path). Waits for
# the r2b queue to drain first (single CPU). Resumable: cells with DONE in
# their log are skipped.
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
# Collapse seed first (seed 1), then seed 0.
run composed12_s1.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=1
run composed12_s0.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=0
echo "QUEUE_R2C DONE $(date +%H:%M:%S)"
