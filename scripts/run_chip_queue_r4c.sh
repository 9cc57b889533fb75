#!/bin/bash
# Round-4 queue c — runs after r4b (waits for its TAIL marker). Stage-b
# component-PSNR cells (verdict item 6): the AB_STAGEB harness runs the
# FULL two-stage pipeline per arm (stage-a train -> light renders ->
# pseudo-label pipeline -> stage-b warm-started partial training) and
# scores RGB + Reflectance + Shading PSNR against the procedural scene's
# analytic GT. In-cell pair: the composed-default toy mirror (control) vs
# the round-4 exact-ladder candidate (hf8).
set -u
DEADLINE=${R4_DEADLINE:-1787239800}
cell_timeout() {
  local now rem
  now=$(date +%s)
  rem=$((DEADLINE - now + 300))
  if [ "$rem" -gt "$1" ]; then rem=$1; fi
  echo "$rem"
}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
cd "$(dirname "$0")/.."
AB=docs/round4_evidence/ab_logs
mkdir -p "$AB"

# Wait for r4b's tail marker (or its driver's death).
while ! grep -q "QUEUE_R4B TAIL DONE" docs/round4_evidence/queue_r4b.log 2>/dev/null; do
  if past_deadline; then echo "deadline while waiting for r4b"; exit 0; fi
  if [ -f /tmp/queue_r4b.pid ] && ! kill -0 "$(cat /tmp/queue_r4b.pid)" 2>/dev/null; then
    echo "r4b driver gone; proceeding"; break
  fi
  sleep 30
done

ab() {
  local log="$AB/$1"; shift
  if [ -s "$log" ] && grep -q "PSNR" "$log" && grep -q DONE "$log"; then
    echo "skip $log"; return
  fi
  if past_deadline; then echo "deadline: skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout "$(cell_timeout 14000)" python scripts/quality_ab.py > "$log" 2>&1
  tail -n 12 "$log"
}

# Stage-b component-PSNR A/B: prodscale C-mirror (toy dict13 composed) vs
# hf8 arm, full pipeline per arm, 2000-iter stage a + 1000-iter stage b.
ab r4_stageb_CF_s0.log AB_STUDY=prodscale AB_STAGEB=1 AB_ITERS=2000 AB_ITERS_B=1000 \
   AB_SEED=0 AB_BASE_CONFIG=syn_sphere_a.yaml AB_VARIANTS="C:,F:"

echo "QUEUE_R4C DONE $(date +%H:%M:%S)"

# 512x512 prodscale arm (verdict item 6): the reference's synthetic
# resolution at the production model shape — control B + candidate F
# in-cell (B is the cheapest exact control).
ab r4_prodscale512_BF_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 \
   AB_IMAGE_SIZE=512 AB_VARIANTS="B:,F:"

echo "QUEUE_R4C TAIL DONE $(date +%H:%M:%S)"
