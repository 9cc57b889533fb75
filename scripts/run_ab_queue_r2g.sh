#!/bin/bash
# Round-2 continuation queue g (tunnel restored, supersedes r2f): the
# decisive composed12 gates, minus the topk attribution cells — chip
# measurements made topk moot (PERF.md: budget+topk16 827.1 vs budget
# 872.7 rays/s; composed12f8+topk16 1768.4 vs composed12f8 3134.2 — a
# measured perf LOSS at both operating points, so no default will ever
# include it and its quality attribution gates nothing).
# Decisive first:
#   1-2. composed12 study (A control + f=0.25 + f=0.125) at seeds 1 and 0 —
#        gates flipping the bench default to composed12/composed12f8
#        (chip-measured 2522.6 / 3134.2 rays/s).
#   3.   lvl12 D at seed 1 — the cell lost to the r2b worker fault
#        (A control shared with cell 1: same platform+seed+config).
# Tail (deferred from r2b/r2e): nolf s0, hessfix s2, prodshape s1.
# One TPU client at a time — run only after bench measurements finish.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs
run() {
  local log="/tmp/ab_logs/$1"; shift
  if [ -s "$log" ] && grep -q DONE "$log"; then echo "skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" python scripts/quality_ab.py > "$log" 2>&1
  tail -n 8 "$log"
}
run c12_2000_s1.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="A:,f=0.25,f=0.125"
run c12_2000_s0.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=0 \
    AB_VARIANTS="A:,f=0.25,f=0.125"
run lvl12_2000_s1_D.log AB_STUDY=lvl12 AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="D:"
run nolf2000_s0.log AB_STUDY=headline AB_ITERS=2000 AB_SEED=0 \
    AB_VARIANTS="nolf"
run hessfix2000_s2.log AB_STUDY=hessfix AB_ITERS=2000 AB_SEED=2 \
    AB_VARIANTS="exact (shared=0),hess=exact f=0.25"
run prodshape2000_s1.log AB_STUDY=prodshape AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="A:,B:"
echo "QUEUE_R2G DONE $(date +%H:%M:%S)"
