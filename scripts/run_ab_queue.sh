#!/bin/bash
# Serial quality-A/B queue (single-CPU box: never run two studies at once).
# Writes one log per study cell under /tmp/ab_logs; round-2 evidence for the
# TPU-tuned headline config (PERF.md). Usage: bash scripts/run_ab_queue.sh
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

# 1) Prod-shaped level/feature restructure gate (L16->L8 at prod growth
#    factors) — the toy-native L8->L4 halving is a flawed mirror.
run prodshape_s0.log AB_STUDY=prodshape AB_ITERS=800 AB_SEED=0
run prodshape_s1.log AB_STUDY=prodshape AB_ITERS=800 AB_SEED=1
# 2) dict+budget cut gate, remaining seeds (s0: baseline 22.02 vs
#    headline-nolf 21.96 — passed; the L4F8 variant is excluded as a bad
#    mirror, superseded by prodshape).
run headline_s1.log AB_STUDY=headline AB_ITERS=800 AB_SEED=1 AB_VARIANTS="baseline,nolf"
run headline_s2.log AB_STUDY=headline AB_ITERS=800 AB_SEED=2 AB_VARIANTS="baseline,nolf"
run prodshape_s2.log AB_STUDY=prodshape AB_ITERS=800 AB_SEED=2
# 3) Stencil hessian fix (VERDICT item 6).
run hessfix_s0.log AB_STUDY=hessfix AB_ITERS=800 AB_SEED=0
echo "QUEUE DONE $(date +%H:%M:%S)"
