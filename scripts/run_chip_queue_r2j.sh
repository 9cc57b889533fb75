#!/bin/bash
# Round-2 continuation queue j — runs AFTER the r2i cluttered gates finish
# (one TPU client at a time). Trimmed to what fits before the round ends:
#   1. dict17 / dict16 bench probes at composed12f8: map the scatter-tier
#      curve between the gated dict19 (3134.2 rays/s) and the ungated
#      dict14 probe (6998.9 rays/s).
#   2. One fresh-process confirmation run of the bench DEFAULT (the
#      composed12f8 flip) — replication evidence AND it primes the remote
#      compile cache for the driver's end-of-round bench run.
# Cut for time (round-3 queue): sphere seed-3 arbitration for the marginal
# -0.21 dB cell; the cluttered dict-capacity ladder (quality_ab composed12
# "c12f8 dict11/dict9" variants).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/bench_logs
while ! grep -q "QUEUE_R2I DONE" /tmp/ab_queue_r2i.log 2>/dev/null; do sleep 60; done
sleep 15
for ds in 17 16; do
  log=/tmp/bench_logs/c12f8_dict${ds}_chip.log
  if [ -s "$log" ] && grep -q rays_per_sec "$log"; then echo "skip $log"; continue; fi
  echo "=== dict${ds} probe ($(date +%H:%M:%S)) ==="
  BENCH_CONFIG=composed12f8 BENCH_DICT_SIZE=${ds} timeout 2000 python bench.py \
    > "$log" 2>"${log%.log}.err"
  tail -1 "$log"
done
log=/tmp/bench_logs/default_flip_confirm.log
echo "=== default (composed12f8) confirmation ($(date +%H:%M:%S)) ==="
timeout 2000 python bench.py > "$log" 2>"${log%.log}.err"
tail -1 "$log"
echo "QUEUE_R2J DONE $(date +%H:%M:%S)"
