#!/bin/bash
# Round-3 queue a — the cotangent-mode corner-sample (csamp-cot) flip chain.
#
# Background: the r2q gates (archived in docs/round3_evidence/ab_logs)
# REJECTED the center-weight csamp on the sphere scene (-3.73/-0.98 dB at
# s0/s1 vs the in-cell c16-composed control; cluttered passed +0.02). The
# mechanism is importance-ratio blowup on the stencil's signed tap weights;
# mode="cotangent" samples corners from the actual per-corner cotangent norm
# (variance-optimal). This queue measures its speed and runs the decisive
# gates. Candidate-only cells reuse the SAME-DAY in-cell chip controls from
# the r2q run (same seed/config/platform):
#   sphere s0 control (B: c16 composed) = 24.04
#   sphere s1 control                   = 24.11
#   cluttered s0 control                = 20.31 (c16csamp_clut cell)
# Strictly serial; ONE TPU client at a time.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs /tmp/bench_logs

ab() {
  local log="/tmp/ab_logs/$1"; shift
  if [ -s "$log" ] && grep -q "PSNR" "$log" && grep -q DONE "$log"; then
    echo "skip $log"; return
  fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout 14000 python scripts/quality_ab.py > "$log" 2>&1
  tail -n 12 "$log"
}

probe() {
  local log="/tmp/bench_logs/$1"; shift
  if [ -s "$log" ] && grep -q rays_per_sec "$log"; then
    echo "skip $log"; return
  fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout 2400 python bench.py > "$log" 2>"${log%.log}.err"
  tail -1 "$log"
}

# 1. Speed: does the cotangent q (extra 8-corner einsum in the bwd) cost
#    throughput vs the center-mode measurements (5684.8 / 2965.8 rays/s)?
probe r3_cscot_d17.log BENCH_CONFIG=composedcs17 BENCH_CORNER_MODE=cotangent
probe r3_cscot_d19.log BENCH_CONFIG=composedcs BENCH_CORNER_MODE=cotangent

# 2. Flip-decisive gates, worst cell first (sphere s0 collapsed -3.73 under
#    center mode).
ab r3_cscot_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="c16 csamp-cot"
ab r3_cscot_s1.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=1 AB_SCENE=sphere \
   AB_VARIANTS="c16 csamp-cot"
ab r3_cscot_clut_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=cluttered \
   AB_VARIANTS="c16 csamp-cot"
# Seed 3 (the L12 fail seed; c16-composed mirror control = 24.01 from r2l).
ab r3_cscot_s3.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=3 AB_SCENE=sphere \
   AB_VARIANTS="B:,c16 csamp-cot"

echo "QUEUE_R3A DONE $(date +%H:%M:%S)"
