#!/bin/bash
# Round-2 continuation queue l — runs after r2k completed (cluttered gates,
# dict17/16 probes, sphere seed-3 FAIL cell for composed12 f=0.125).
# Serial, ONE TPU client at a time. Order: fast attribution probes first
# (they steer the session's code work), then the decisive gate cells.
#
#   1. BENCH_FREEZE subtraction profiling at composed12f8 (dict19 + dict17):
#      step(full) - step(FREEZE=tables) = backward table-scatter share;
#      step(FREEZE=tables) - step(FREEZE=sdf) = SDF-MLP backward share.
#      Attributes the ~0.29 s/step non-scatter remainder in-window.
#   2. Sphere seed-3 ATTRIBUTION cell: the r2k seed-3 composed12 f=0.125
#      cell FAILED (-0.45 dB). Re-run with the c16 composed mirror (the toy
#      mirror of the CURRENT default) in the same cell: if c16 also drops
#      ~0.4 dB at seed 3, the regression is not the L12 cut and the flip
#      compares clean against the accepted default; if c16 is clean, L12
#      is implicated and the flip is blocked.
#   3. Cluttered seed-2 arbitration for the dict11 (prod dict17 mirror)
#      ladder cell (s0 -0.21 marginal / s1 -0.08 pass).
#   4. fhalf: equal-bytes F8-vs-F4 sign at the small-table tier.
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

# 1. Remainder attribution (fast)
probe c12f8_freeze_tables.log BENCH_CONFIG=composed12f8 BENCH_FREEZE=tables
probe c12f8_freeze_sdf.log BENCH_CONFIG=composed12f8 BENCH_FREEZE=sdf
probe c12f8_d17_freeze_tables.log BENCH_CONFIG=composed12f8 BENCH_DICT_SIZE=17 BENCH_FREEZE=tables

# 2. Seed-3 attribution (decisive for the default flip)
ab c12_2000_s3_attrib.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=3 \
   AB_SCENE=sphere AB_VARIANTS="A:,c16,f=0.125"

# 3. Cluttered seed-2 dict17-mirror arbitration
ab c12_clut_s2.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=2 \
   AB_SCENE=cluttered AB_VARIANTS="A:,f=0.125,dict11"

# 4. Equal-bytes feature-width sign
ab fhalf_s0.log AB_STUDY=fhalf AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere

echo "QUEUE_R2L DONE $(date +%H:%M:%S)"
