#!/bin/bash
# Round-2 continuation queue q — the r2p plan rebuilt for a fresh session
# (/tmp wiped, no r2l flag to wait on). Strictly serial; ONE TPU client at
# a time.
#
# Deliberate prune vs the r2p plan (advisor item, round 2): the seed-1 L12
# csamp gate (csamp_s1), cs17_ft_slev4 and cs17_hf1 were dropped to fit the
# session budget — the L12 csamp family is opt-in documentation only (L12
# was already rejected as a default at seed 3), so it gets single-seed
# evidence; the two cs17 sub-probes are superseded by cs17_slev4/cs17_spd64.
# RESULTS (2026-08-19 run, archived docs/round3_evidence/): the c16 csamp
# gates FAILED on the sphere (-3.73/-0.98 dB) — see PERF.md "r2q gate
# results"; round 3 replaces the center-weight corner draw with the
# cotangent-norm draw (queue r3a).
#
# Flip-decision order:
#
#   1. composedcs / composedcs17 speed probes (the corner-sampled L16
#      composed family — the only ungated knob on top of the fully-gated
#      composed default is corner_sample)
#   2. c16 csamp quality gates: sphere s0/s1 + cluttered s0, in-cell
#      exact-scatter control B
#   3. c16d11 capacity cell (prod dict17 mirror under L16, cluttered)
#   4. csamp under the L12 composition (opt-in family documentation)
#   5. Remainder/headroom probes at the csamp operating point
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

# 1. Speed probes (flip headline candidates)
probe c16_csamp_d19.log BENCH_CONFIG=composedcs
probe c16_csamp_d17.log BENCH_CONFIG=composedcs17

# 2. Flip-decisive c16 csamp gates
ab c16csamp_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="B:,c16 csamp"
ab c16csamp_s1.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=1 AB_SCENE=sphere \
   AB_VARIANTS="B:,c16 csamp"
ab c16csamp_clut_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=cluttered \
   AB_VARIANTS="B:,c16 csamp"

# 3. L16 capacity cell (prod dict17 mirror) on the cluttered scene
ab c16d11_clut_s0.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=0 AB_SCENE=cluttered \
   AB_VARIANTS="A:,c16 composed,c16d11"

# 4. csamp under the L12 composition (documents the opt-in family)
probe csamp_d19.log BENCH_CONFIG=composed12f8 BENCH_CORNER_SAMPLE=1
probe csamp_d17.log BENCH_CONFIG=composed12f8 BENCH_DICT_SIZE=17 BENCH_CORNER_SAMPLE=1
ab csamp_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="A:,floor=0.125"

# 5. Remainder/headroom probes at the csamp operating point
probe cs17_ft_hshared.log BENCH_CONFIG=composedcs17 BENCH_FREEZE=tables \
  BENCH_HESS_MODE=shared
probe cs17_slev4.log BENCH_CONFIG=composedcs17 BENCH_SAMPLING_LEVELS=4
probe cs17_spd64.log BENCH_CONFIG=composedcs17 BENCH_SPD=64

echo "QUEUE_R2Q DONE $(date +%H:%M:%S)"
