#!/bin/bash
# Round-3 queue c — top1cot flip gates (the Rao-Blackwellized corner draw).
#
# Background: the cotangent-mode gates (queue r3a, logs r3_cscot_*) came in
# at -0.61/-0.32 dB on the sphere vs the r2q same-day controls — better than
# center mode's -3.73 collapse but above the ~0.2 dB flip bar. mode=top1cot
# scatters the argmax-norm corner EXACTLY plus one importance-sampled
# residual row (2 rows/point = 4x cut vs exact; measured estimator variance
# < 0.5x cotangent in tests/test_corner_sample.py). These cells decide the
# round-3 default flip.
#
# Controls: sphere s0 runs IN-CELL (the decisive worst cell); the rest are
# candidate-only against the same-day chip controls
#   sphere s1 = 24.11 (r2q), cluttered s0 = 20.31 (r2q),
#   sphere s3 = 24.30 (r3a in-cell B control).
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

# Decisive worst cell first, with its in-cell control.
ab r3_cstop1_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="B:,c16 csamp-top1"

# Speed: 2 scatter rows/point vs cotangent's 1 — what does it cost?
probe r3_cstop1_d19.log BENCH_CONFIG=composedcs BENCH_CORNER_MODE=top1cot
probe r3_cstop1_d17.log BENCH_CONFIG=composedcs17 BENCH_CORNER_MODE=top1cot

# Remaining gates, candidate-only vs same-day controls (header).
ab r3_cstop1_s1.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=1 AB_SCENE=sphere \
   AB_VARIANTS="c16 csamp-top1"
ab r3_cstop1_clut_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=cluttered \
   AB_VARIANTS="c16 csamp-top1"
ab r3_cstop1_s3.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=3 AB_SCENE=sphere \
   AB_VARIANTS="c16 csamp-top1"

echo "QUEUE_R3C DONE $(date +%H:%M:%S)"
