#!/bin/bash
# Seed-0 convergence-length follow-up: waits for the main queue to finish
# (single CPU), then completes the 2-seed gates for the candidate configs.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs
while pgrep -f "scripts/quality_ab.py" > /dev/null 2>&1 || \
      ! grep -q "QUEUE DONE" /tmp/ab_logs/queue.log 2>/dev/null; do
  sleep 60
done
run() {
  local log="/tmp/ab_logs/$1"; shift
  if [ -s "$log" ] && grep -q DONE "$log"; then echo "skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" python scripts/quality_ab.py > "$log" 2>&1
  tail -n 6 "$log"
}
# Remove the defer markers so the real cells run.
for f in nolf2000_s0 base2000_s0; do
  grep -q DEFERRED /tmp/ab_logs/$f.log 2>/dev/null && rm -f /tmp/ab_logs/$f.log
done
# Priority: the L12 seed-0 pair (decides the exact-path default), then the
# dict+budget seed-0 convergence pair, then the stencil-hessfix seed-0 cell.
run lvl12_2000_s0.log AB_STUDY=lvl12 AB_ITERS=2000 AB_SEED=0
run base2000_s0.log AB_STUDY=headline AB_ITERS=2000 AB_SEED=0 AB_VARIANTS="baseline"
run nolf2000_s0.log AB_STUDY=headline AB_ITERS=2000 AB_SEED=0 AB_VARIANTS="nolf"
run hessfix2000_s0.log AB_STUDY=hessfix AB_ITERS=2000 AB_SEED=0 AB_VARIANTS="hess=exact f=0.25"
echo "QUEUE_S0 DONE $(date +%H:%M:%S)"
