#!/bin/bash
# Round-2 continuation queue: the convergence-length (2000-iter) cells that
# decide the bench default. Sequential (single CPU); each cell skipped if its
# log already shows DONE, so the queue is resumable.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs
run() {
  local log="/tmp/ab_logs/$1"; shift
  if [ -s "$log" ] && grep -q DONE "$log"; then echo "skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" python scripts/quality_ab.py > "$log" 2>&1
  tail -n 6 "$log"
}
# 1. Stencil+hessfix at seed 0 (seed 1 passed +0.11): decides the stencil
#    default. Control (exact shared=0) + candidate.
run hessfix2000_s0.log AB_STUDY=hessfix AB_ITERS=2000 AB_SEED=0 \
    AB_VARIANTS="exact (shared=0),hess=exact f=0.25"
# 2. L12 at both seeds: the exact-path default candidate (1162.7 rays/s).
run lvl12_2000_s1.log AB_STUDY=lvl12 AB_ITERS=2000 AB_SEED=1
run lvl12_2000_s0.log AB_STUDY=lvl12 AB_ITERS=2000 AB_SEED=0
# 3. Composed production fast path (1905.6 rays/s): nolf+stencil+hessfix
#    interactions. Seed-1 baseline @2000 is already measured (24.15), so
#    seed 1 runs the composed cell only.
run composed2000_s1.log AB_STUDY=composed AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="composed"
run composed2000_s0.log AB_STUDY=composed AB_ITERS=2000 AB_SEED=0
# 4. dict+budget cut at seed 0 convergence (seed 1 passed -0.15).
run nolf2000_s0.log AB_STUDY=headline AB_ITERS=2000 AB_SEED=0 \
    AB_VARIANTS="nolf"
# 5. Third seed for the stencil+hessfix verdict.
run hessfix2000_s2.log AB_STUDY=hessfix AB_ITERS=2000 AB_SEED=2 \
    AB_VARIANTS="exact (shared=0),hess=exact f=0.25"
# 6. L8 halving re-judge at convergence (its 800-iter FAIL may be the same
#    truncation artifact) at the collapse seed.
run prodshape2000_s1.log AB_STUDY=prodshape AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="A:,B:"
echo "QUEUE_R2B DONE $(date +%H:%M:%S)"
