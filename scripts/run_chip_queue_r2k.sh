#!/bin/bash
# Round-2 continuation queue k — the session restarted with /tmp wiped, so
# the r2i cluttered gates and the r2j probes never produced surviving
# evidence. This master queue re-runs everything serially (ONE TPU client
# at a time), ordered by decision importance:
#
#   1. Cluttered-scene stress gates for the composed12f8 default flip
#      (AB_SCENE=cluttered, seeds 0/1), with the dict-capacity ladder
#      (c12f8 dict11/dict9 = prod dict17/15 mirrors) folded into the same
#      cells so the ladder shares the in-cell control.
#   2. dict17 / dict16 bench probes at composed12f8: map the scatter-tier
#      curve between gated dict19 (3134.2 rays/s) and the ungated dict14
#      probe (6998.9 rays/s).
#   3. Sphere seed-3 arbitration for composed12 f=0.125 (seed-2 cell was
#      marginal at -0.21 dB).
#   4. Fresh-process confirmation run of the bench default (replication
#      evidence + primes the remote compile cache for the driver bench).
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

# 1. Decisive cluttered gates (+ dict ladder in-cell)
ab c12_clut_s0.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=0 \
   AB_SCENE=cluttered AB_VARIANTS="A:,f=0.125,dict11,dict9"
ab c12_clut_s1.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=1 \
   AB_SCENE=cluttered AB_VARIANTS="A:,f=0.125,dict11,dict9"

# 2. Scatter-tier probes between dict19 and dict14
probe c12f8_dict17_chip.log BENCH_CONFIG=composed12f8 BENCH_DICT_SIZE=17
probe c12f8_dict16_chip.log BENCH_CONFIG=composed12f8 BENCH_DICT_SIZE=16

# 3. Sphere seed-3 arbitration for the marginal seed-2 cell
ab c12_2000_s3.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=3 \
   AB_SCENE=sphere AB_VARIANTS="A:,f=0.125"

# 4. Bench-default confirmation (run LAST so it reflects any flip)
probe default_confirm.log

echo "QUEUE_R2K DONE $(date +%H:%M:%S)"
