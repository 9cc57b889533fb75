#!/bin/bash
# Round-5 queue c — chains off r5b: rerun of the production-shape stage-b
# intrinsic cell (B vs I), whose first attempt died when the B arm's
# post-training light renders faulted the worker at the 32-chunk window
# (r5_stageb_prod_BI_s0.log attempt 1; the scale/post-training-keyed auto
# window now caps same-process renders at the proven 4-chunk window).
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

while ! grep -q "QUEUE_R5B DONE" docs/round5_evidence/queue_r5b.log 2>/dev/null; do
  if past_deadline; then echo "deadline while waiting for r5b"; exit 0; fi
  if [ -f /tmp/queue_r5b.pid ] && ! kill -0 "$(cat /tmp/queue_r5b.pid)" 2>/dev/null; then
    echo "r5b driver gone; proceeding"; break
  fi
  sleep 60
done

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

mv -f "$AB/r5_stageb_prod_BI_s0.log" "$AB/r5_stageb_prod_BI_s0.attempt1_workerfault.log" 2>/dev/null || true
ab r5_stageb_prod_BI_s0.log AB_STUDY=prodscale AB_STAGEB=1 AB_ITERS=2000 AB_ITERS_B=1000 \
   AB_SEED=0 AB_VARIANTS="B:,I:"

echo "QUEUE_R5C DONE $(date +%H:%M:%S)"
