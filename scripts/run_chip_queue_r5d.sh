#!/bin/bash
# Round-5 queue d — chains off r5b's DONE marker. Two cells, judge-priority
# order:
#   1. Production-shape stage-b intrinsic cell (B vs I) — rerun of the
#      r5a cell whose B arm faulted the worker at the (since fixed)
#      post-training 32-chunk render window.
#   2. End-to-end chip artifact — its r5b slot was lost to a missing
#      output directory (mkdir fixed); the pipeline itself was verified
#      end-to-end on CPU this round.
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
mkdir -p "$AB" docs/round5_evidence/e2e

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

# 1. Production-shape stage-b B vs I (intrinsic Ref/Sha gate at the real
#    model shape).
mv -f "$AB/r5_stageb_prod_BI_s0.log" "$AB/r5_stageb_prod_BI_s0.attempt1_workerfault.log" 2>/dev/null || true
ab r5_stageb_prod_BI_s0.log AB_STUDY=prodscale AB_STAGEB=1 AB_ITERS=2000 AB_ITERS_B=1000 \
   AB_SEED=0 AB_VARIANTS="B:,I:"

# 2. E2E artifact.
if ! grep -q "E2E DONE" docs/round5_evidence/e2e/pipeline.log 2>/dev/null; then
  if ! past_deadline; then
    echo "=== e2e artifact ($(date +%H:%M:%S)) ==="
    timeout "$(cell_timeout 10800)" bash scripts/run_e2e_chip.sh \
      > docs/round5_evidence/e2e/driver.log 2>&1 || \
      echo "e2e FAILED (see docs/round5_evidence/e2e/)"
    tail -3 docs/round5_evidence/e2e/driver.log
  fi
fi

echo "QUEUE_R5D DONE $(date +%H:%M:%S)"
