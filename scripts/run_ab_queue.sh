#!/bin/bash
# Serial quality-A/B queue (single-CPU box: never run two studies at once).
# Logs under /tmp/ab_logs; cells already containing DONE are skipped, so the
# queue is idempotent and restartable. Round-2 evidence ledger: PERF.md.
#
# 800-iter caveat discovered mid-round: the toy schedule (coarse2fine step
# 200, warm-up 200, LR two_steps at [1200,1600]) means an 800-iter run stops
# mid-annealing (4/8 levels active) at full LR. 2000 iters is the toy
# scene's designed convergence length — the decisive gates run there.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs
run() { # run <logname> <env...>
  local log="/tmp/ab_logs/$1"; shift
  if [ -s "$log" ] && grep -q DONE "$log"; then echo "skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" python scripts/quality_ab.py > "$log" 2>&1
  tail -n 6 "$log"
}

# 1) Truncation-hypothesis test: does the seed-1 "collapse" of the reduced
#    config persist at convergence length?
run nolf2000_s1.log AB_STUDY=headline AB_ITERS=2000 AB_SEED=1 AB_VARIANTS="nolf"
run base2000_s1.log AB_STUDY=headline AB_ITERS=2000 AB_SEED=1 AB_VARIANTS="baseline"
# 2) Same pair at seed 0 (convergence-length control for the -0.06 result).
run nolf2000_s0.log AB_STUDY=headline AB_ITERS=2000 AB_SEED=0 AB_VARIANTS="nolf"
run base2000_s0.log AB_STUDY=headline AB_ITERS=2000 AB_SEED=0 AB_VARIANTS="baseline"
# 3) Stencil hessian fix (VERDICT item 6) at convergence length, seed 1
#    (the stencil's worst seed in the round-1 800-iter ledger).
run hessfix2000_s1.log AB_STUDY=hessfix AB_ITERS=2000 AB_SEED=1 AB_VARIANTS="hess=exact f=0.25,exact (shared=0)"
# 4) Level cut at convergence length, seed 1.
run lvl12_2000_s1.log AB_STUDY=lvl12 AB_ITERS=2000 AB_SEED=1
run prodshape2000_s1.log AB_STUDY=prodshape AB_ITERS=2000 AB_SEED=1 AB_VARIANTS="B:"
echo "QUEUE DONE $(date +%H:%M:%S)"
