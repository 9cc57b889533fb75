#!/bin/bash
# Round-2 continuation queue f (tunnel restored): the attribution cells for
# the composed12* candidate ladder, then the deferred non-decisive tail.
# Decisive first:
#   1-2. composed12 study (A control + f=0.25 + f=0.125) at seeds 1 and 0 —
#        gates flipping the bench default to composed12/composed12f8.
#   3.   c12f8+topk24 at seed 1 — milder-K attribution for the topk16 FAIL
#        (A control shared with cell 1: same platform+seed+config).
#   4.   topk standalone at seed 1 — is subsampling itself the regressor,
#        or only its composition with L12+f8?
#   5.   lvl12 D at seed 1 — the cell lost to the r2b worker fault
#        (A control shared with cell 1).
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
run c12topk24_s1.log AB_STUDY=composed12topk AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="topk24"
run topk_s1.log AB_STUDY=topk AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="full-grad,topk=16"
run lvl12_2000_s1_D.log AB_STUDY=lvl12 AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="D:"
run nolf2000_s0.log AB_STUDY=headline AB_ITERS=2000 AB_SEED=0 \
    AB_VARIANTS="nolf"
run hessfix2000_s2.log AB_STUDY=hessfix AB_ITERS=2000 AB_SEED=2 \
    AB_VARIANTS="exact (shared=0),hess=exact f=0.25"
run prodshape2000_s1.log AB_STUDY=prodshape AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="A:,B:"
echo "QUEUE_R2F DONE $(date +%H:%M:%S)"
