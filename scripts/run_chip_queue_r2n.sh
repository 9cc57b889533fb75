#!/bin/bash
# Round-2 continuation queue n — the L16 (composed-family) csamp ladder.
# The seed-3 attribution cell (r2l) showed the current default's mirror at
# -0.13 dB (its usual cost) while composed12 f=0.125 sits at -0.45: the
# L16 -> L12 cut IS implicated, so the flip-safe chain is
# composed (L16) + corner_sample (+ dict17 if its L16 gate holds).
# Waits for queue r2m. Serial, ONE TPU client at a time.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs /tmp/bench_logs

for i in $(seq 1 600); do
  grep -q "QUEUE_R2M DONE" /tmp/queue_r2m.log 2>/dev/null && break
  sleep 60
done

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

# 1. Speed probes for the L16 family
probe c16_csamp_d19.log BENCH_CONFIG=composed BENCH_CORNER_SAMPLE=1
probe c16_csamp_d17.log BENCH_CONFIG=composed BENCH_DICT_SIZE=17 BENCH_CORNER_SAMPLE=1

# 2. csamp gate on the L16 composed mirror (sphere, 2000 iters, 2 seeds).
#    B: in-cell exact-scatter control (A-bar comparability comes from the
#    c16-vs-A deltas already measured in the composed12 cells).
ab c16csamp_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="B:,c16 csamp"
ab c16csamp_s1.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=1 AB_SCENE=sphere \
   AB_VARIANTS="B:,c16 csamp"

# 3. Cluttered stress gate for c16 csamp
ab c16csamp_clut_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=cluttered \
   AB_VARIANTS="B:,c16 csamp"

# 4. L16 capacity cell (prod dict17 mirror) on the cluttered scene
ab c16d11_clut_s0.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=0 AB_SCENE=cluttered \
   AB_VARIANTS="A:,c16 composed,c16d11"

echo "QUEUE_R2N DONE $(date +%H:%M:%S)"
