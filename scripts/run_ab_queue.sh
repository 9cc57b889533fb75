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

# 1) Composed headline config, 3 seeds (gates the bench default flip).
run headline_s0.log AB_STUDY=headline AB_ITERS=800 AB_SEED=0
run headline_s1.log AB_STUDY=headline AB_ITERS=800 AB_SEED=1
run headline_s2.log AB_STUDY=headline AB_ITERS=800 AB_SEED=2
# 2) dict study multi-seed completion (seed 0 already in PERF.md).
run dict_s1.log AB_STUDY=dict AB_ITERS=800 AB_SEED=1 AB_VARIANTS="dict=16,dict=13"
run dict_s2.log AB_STUDY=dict AB_ITERS=800 AB_SEED=2 AB_VARIANTS="dict=16,dict=13"
# 3) Individual-knob attribution at seed 0.
run budget_s0.log AB_STUDY=budget AB_ITERS=800 AB_SEED=0
run lf_s0.log AB_STUDY=lf AB_ITERS=800 AB_SEED=0
# 4) Stencil hessian fix (VERDICT item 6).
run hessfix_s0.log AB_STUDY=hessfix AB_ITERS=800 AB_SEED=0
echo "QUEUE DONE $(date +%H:%M:%S)"
