#!/bin/bash
# Round-2 continuation queue h: the non-decisive tail cells deferred by the
# r2g trim (the decisive composed12 cells + chip measurements are done).
# Each with an in-cell control where the study defines one:
#   1. lvl12 D at seed 1 — the attribution cell lost to the r2b worker
#      fault (L12 standalone on the exact-tap path).
#   2. nolf s0 — headline-study no-light-field ablation robustness cell.
#   3. hessfix s2 — third-seed robustness for the stencil curvature fix.
#   4. prodshape s1 — prod-shaped control pairing at the second seed.
# One TPU client at a time — run only after bench measurements finish.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs
run() {
  local log="/tmp/ab_logs/$1"; shift
  if [ -s "$log" ] && grep -q "PSNR" "$log" && grep -q DONE "$log"; then
    echo "skip $log"; return
  fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" python scripts/quality_ab.py > "$log" 2>&1
  tail -n 8 "$log"
}
run lvl12_2000_s1_D.log AB_STUDY=lvl12 AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="A:,D:"
run nolf2000_s0.log AB_STUDY=headline AB_ITERS=2000 AB_SEED=0 \
    AB_VARIANTS="baseline,nolf"
run hessfix2000_s2.log AB_STUDY=hessfix AB_ITERS=2000 AB_SEED=2 \
    AB_VARIANTS="exact (shared=0),hess=exact f=0.25"
run prodshape2000_s1.log AB_STUDY=prodshape AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="A:,B:"
echo "QUEUE_R2H DONE $(date +%H:%M:%S)"
