#!/bin/bash
# Round-2 continuation queue m — corner-sampled backward scatter
# (gradient.corner_sample: ops/hashgrid.corner_sampled_combine).
# Subtraction profiling (r2l) attributed the composed12f8 step:
#   dict19: 0.653 s = 0.319 scatter + 0.006 sdf-mlp-bwd + 0.328 remainder
#   dict17: 0.452 s = ~0.31 scatter + 0.139 remainder  (69% scatter!)
# Corner sampling cuts scatter rows 8x with no extra forward, so the row
# model projects ~5.5k rays/s at dict19 and ~11k at dict17 — measured here,
# then quality-gated (the estimator is unbiased; the gate prices its
# variance).
#
# Waits for queue r2l to finish (ONE TPU client at a time).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs /tmp/bench_logs

for i in $(seq 1 500); do
  grep -q "QUEUE_R2L DONE" /tmp/queue_r2l.log 2>/dev/null && break
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

# 1. Speed probes (fast, decide whether the gates are worth their cells)
probe csamp_d19.log BENCH_CONFIG=composed12f8 BENCH_CORNER_SAMPLE=1
probe csamp_d17.log BENCH_CONFIG=composed12f8 BENCH_DICT_SIZE=17 BENCH_CORNER_SAMPLE=1

# 2. Quality gates: sphere 2000-iter, seeds 0/1 (floor=0.125 arm only — the
#    floor-sensitivity arm spends a cell only if these fail)
ab csamp_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="A:,floor=0.125"
ab csamp_s1.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=1 AB_SCENE=sphere \
   AB_VARIANTS="A:,floor=0.125"

# 3. Cluttered stress gate
ab csamp_clut_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=cluttered \
   AB_VARIANTS="A:,floor=0.125"

echo "QUEUE_R2M DONE $(date +%H:%M:%S)"
