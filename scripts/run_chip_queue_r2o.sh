#!/bin/bash
# Round-2 continuation queue o — remainder attribution and headroom probes
# at the corner-sampled operating point (all fast cells, no 2000-iter gates).
# After csamp, the step is remainder-dominated; these probes map where the
# remainder goes and what quality headroom csamp buys back. Waits for r2n.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/bench_logs

for i in $(seq 1 700); do
  grep -q "QUEUE_R2N DONE" /tmp/queue_r2n.log 2>/dev/null && break
  sleep 60
done

probe() {
  local log="/tmp/bench_logs/$1"; shift
  if [ -s "$log" ] && grep -q rays_per_sec "$log"; then
    echo "skip $log"; return
  fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout 2400 python bench.py > "$log" 2>"${log%.log}.err"
  tail -1 "$log"
}

# Remainder subtraction at composedcs17 (tables frozen = csamp-independent):
# 1. hessian-exact forward share (shared mode drops the exact-tap evals)
probe cs17_ft_hshared.log BENCH_CONFIG=composedcs17 BENCH_FREEZE=tables \
  BENCH_HESS_MODE=shared
# 2. sampling-PDF gather share (first-4-levels truncation)
probe cs17_ft_slev4.log BENCH_CONFIG=composedcs17 BENCH_FREEZE=tables \
  BENCH_SAMPLING_LEVELS=4
# 3. quality headroom: fully-exact hessian under csamp (f 0.25 -> 1.0)
probe cs17_hf1.log BENCH_CONFIG=composedcs17 BENCH_HESS_FRACTION=1.0
# 4. speed candidate: slev4 full step
probe cs17_slev4.log BENCH_CONFIG=composedcs17 BENCH_SAMPLING_LEVELS=4
# 5. window amortization at the fast point
probe cs17_spd64.log BENCH_CONFIG=composedcs17 BENCH_SPD=64

echo "QUEUE_R2O DONE $(date +%H:%M:%S)"
