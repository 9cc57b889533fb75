#!/bin/bash
# Round-5 queue a — the verdict's chip cells, in its priority order:
#   1. prodscale B_s1: the seed-1 EXACT control that makes I_s1 = 20.95
#      readable as a delta (round-4 open item; the flip's seed-1 verdict).
#   2. Stage-b intrinsic gates, toy mirror: exact A + shipped I arms with
#      RGB/Ref/Sha component PSNR (C = 24.14/15.57/12.71 landed in r4's
#      r4_stageb_CF_s0.log; A anchors, I prices the shipped semantics).
#   3. Stage-b intrinsic gate at PRODUCTION shape: in-cell B (exact-budget
#      control) vs I (shipped) on the 256x256 cluttered scene — the
#      decisive "intrinsics at the shipped fast semantics" cell.
# r5b (e2e artifact + 512x512 arm + fresh bench) chains off this queue's
# DONE marker (scripts/run_chip_queue_r5b.sh).
set -u
DEADLINE=${R5_DEADLINE:-$(( $(date +%s) + 39600 ))}
cell_timeout() {
  local now rem
  now=$(date +%s)
  rem=$((DEADLINE - now + 300))
  if [ "$rem" -gt "$1" ]; then rem=$1; fi
  echo "$rem"
}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
cd "$(dirname "$0")/.."
AB=docs/round5_evidence/ab_logs
mkdir -p "$AB"

ab() {
  local log="$AB/$1"; shift
  if [ -s "$log" ] && grep -q "PSNR" "$log" && grep -q DONE "$log"; then
    echo "skip $log"; return
  fi
  if past_deadline; then echo "deadline: skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout "$(cell_timeout 14000)" python scripts/quality_ab.py > "$log" 2>&1
  tail -n 6 "$log"
}

# 1. The seed-1 exact control (B arm, production shape, seed 1).
ab r5_prodscale_B_s1.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="B:"

# 2. Stage-b toy-mirror component gates: exact anchor + shipped arm.
ab r5_stageb_AI_s0.log AB_STUDY=prodscale AB_STAGEB=1 AB_ITERS=2000 AB_ITERS_B=1000 \
   AB_SEED=0 AB_BASE_CONFIG=syn_sphere_a.yaml AB_VARIANTS="A:,I:"

# 3. Stage-b at PRODUCTION shape, in-cell B vs I (2000+1000 iters keeps the
#    cell inside the night; within-cell deltas are the signal).
ab r5_stageb_prod_BI_s0.log AB_STUDY=prodscale AB_STAGEB=1 AB_ITERS=2000 AB_ITERS_B=1000 \
   AB_SEED=0 AB_VARIANTS="B:,I:"

echo "QUEUE_R5A DONE $(date +%H:%M:%S)"
