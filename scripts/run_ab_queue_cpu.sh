#!/bin/bash
# CPU gate queue (TPU tunnel down): the decisive convergence-length cells,
# prioritized, each with an IN-CELL control so control/candidate share the
# platform (fp reduction order shifts absolute PSNR; see quality_ab.py).
# ~40 min/variant on the single CPU core. Resumable via DONE markers.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs
run() {
  local log="/tmp/ab_logs/$1"; shift
  if [ -s "$log" ] && grep -q DONE "$log"; then echo "skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu "$@" \
      python scripts/quality_ab.py > "$log" 2>&1
  tail -n 8 "$log"
}
# 1. composed (the chip-measured 1905.6 rays/s fast path): control+candidate.
run composed_cpu_s1.log AB_STUDY=composed AB_ITERS=2000 AB_SEED=1
run composed_cpu_s0.log AB_STUDY=composed AB_ITERS=2000 AB_SEED=0
# 2. The full composition candidate (composed12f8 + topk).
run c12topk_cpu_s1.log AB_STUDY=composed12topk AB_ITERS=2000 AB_SEED=1 \
    AB_VARIANTS="A:,topk16"
run c12topk_cpu_s0.log AB_STUDY=composed12topk AB_ITERS=2000 AB_SEED=0 \
    AB_VARIANTS="A:,topk16"
# 3. The exact-path L12 gate (1162.7 rays/s fallback candidate).
run lvl12_cpu_s1.log AB_STUDY=lvl12 AB_ITERS=2000 AB_SEED=1
run lvl12_cpu_s0.log AB_STUDY=lvl12 AB_ITERS=2000 AB_SEED=0
echo "QUEUE_CPU DONE $(date +%H:%M:%S)"
