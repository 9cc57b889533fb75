#!/bin/bash
# Round-2 continuation queue j — runs AFTER the r2i cluttered gates finish
# (one TPU client at a time):
#   1. dict17 / dict16 bench probes at composed12f8: map the scatter-tier
#      curve between the gated dict19 (3134.2 rays/s) and the ungated
#      dict14 probe (6998.9 rays/s). Timing runs — hold while the CPU
#      verify pass is live (contention perturbs wall clock).
#   2. Sphere seed-3 arbitration for composed12 f=0.125 (the 3-seed gate
#      has one marginal cell at -0.21 dB; a 4th seed firms the multi-seed
#      mean before the default flip rides on it).
#   3. Cluttered-scene capacity ladder at seed 0 (toy bound for the
#      dict19 -> dict14 class of cut; see quality_ab composed12 study).
# Ordered by decision value; the tail is cut if the round ends first.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/bench_logs /tmp/ab_logs
while ! grep -q "QUEUE_R2I DONE" /tmp/ab_queue_r2i.log 2>/dev/null; do sleep 60; done
while [ -e /tmp/verify_running ]; do sleep 30; done
sleep 15
for ds in 17 16; do
  log=/tmp/bench_logs/c12f8_dict${ds}_chip.log
  if [ -s "$log" ] && grep -q rays_per_sec "$log"; then echo "skip $log"; continue; fi
  echo "=== dict${ds} probe ($(date +%H:%M:%S)) ==="
  BENCH_CONFIG=composed12f8 BENCH_DICT_SIZE=${ds} timeout 2400 python bench.py \
    > "$log" 2>"${log%.log}.err"
  tail -1 "$log"
done
log=/tmp/ab_logs/c12_2000_s3.log
if [ -s "$log" ] && grep -q "PSNR" "$log" && grep -q DONE "$log"; then
  echo "skip $log"
else
  echo "=== sphere seed-3 arbitration ($(date +%H:%M:%S)) ==="
  AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=3 \
    AB_VARIANTS="A:,composed12 f=0.125" \
    python scripts/quality_ab.py > "$log" 2>&1
  tail -n 8 "$log"
fi
log=/tmp/ab_logs/c12_clut_dictladder_s0.log
if [ -s "$log" ] && grep -q "PSNR" "$log" && grep -q DONE "$log"; then
  echo "skip $log"
else
  echo "=== cluttered capacity ladder s0 ($(date +%H:%M:%S)) ==="
  AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=0 AB_SCENE=cluttered \
    AB_VARIANTS="A:,c12f8 dict11,c12f8 dict9" \
    python scripts/quality_ab.py > "$log" 2>&1
  tail -n 10 "$log"
fi
echo "QUEUE_R2J DONE $(date +%H:%M:%S)"
