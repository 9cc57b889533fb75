#!/bin/bash
# Round-3 queue f — post-master extras (started by run_chip_queue_r3f_watch.sh
# once /tmp/queue_r3_master.log shows QUEUE_R3_MASTER DONE). Deadline-gated
# like r3d/r3e: the driver benches the shipped default at round end and
# nothing here may still hold the TPU client then.
#
#  1. Inference dispatch-window ladder at the default config (verdict item 9
#     fault isolation): the worker fault tracks per-window WALL TIME (~60-70 s
#     under scatter/copy pressure; PERF.md bisection). Inference windows at
#     3963 rays/s are 4096*W/3963 s — the ladder brackets where (if anywhere)
#     the no-scatter inference program hits the boundary, and how much window
#     amortization is still on the table past the validated 4096x4.
#  2. A no-env bench of the shipped DEFAULT_CONFIG — exactly what the driver
#     will run for BENCH_r03 — so the flip decision is pre-verified.
set -u
DEADLINE=1787185200
cell_timeout() {
  local now rem
  now=$(date +%s)
  rem=$((DEADLINE - now + 300))
  if [ "$rem" -gt "$1" ]; then rem=$1; fi
  echo "$rem"
}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
cd "$(dirname "$0")/.."
mkdir -p /tmp/bench_logs

inf() {
  local log="/tmp/bench_logs/$1"; shift
  if [ -s "$log" ] && grep -q rays_per_sec "$log"; then
    echo "skip $log"; return
  fi
  if past_deadline; then echo "deadline: skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout "$(cell_timeout 1800)" python scripts/bench_inference.py \
    > "$log" 2>"${log%.log}.err"
  tail -1 "$log"
}

ab() {
  local log="/tmp/ab_logs/$1"; shift
  if [ -s "$log" ] && grep -q "PSNR" "$log" && grep -q DONE "$log"; then
    echo "skip $log"; return
  fi
  if past_deadline; then echo "deadline: skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout "$(cell_timeout 14000)" python scripts/quality_ab.py > "$log" 2>&1
  tail -n 12 "$log"
}
mkdir -p /tmp/ab_logs

# -1. Decisive IN-CELL rerun of the lr3 worst cell: the r3d lrx arms vs the
#     r3c in-cell control were cross-process (~0.25 dB platform noise), and
#     s0 lr3 came in -0.29 while s1/s3 sit at -0.00/-0.02. One same-process
#     control+lr3 cell settles whether s0 is a real failure or noise.
ab r3_lr3_incell_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="B:,c16 csamp-top1-lr3$"

# 0. Gather-rate tier sweep (completes the speed-of-light model: converts
#    the static forward-gather row counts from scripts/attribute_rows.py
#    to seconds, like the measured scatter tiers do for the backward).
if ! past_deadline && [ ! -s /tmp/bench_logs/r3_gather_sweep.log ]; then
  echo "=== gather sweep ($(date +%H:%M:%S)) ==="
  timeout "$(cell_timeout 2400)" python -u scripts/bench_gather_sweep.py \
    > /tmp/bench_logs/r3_gather_sweep.log 2>&1
  tail -3 /tmp/bench_logs/r3_gather_sweep.log
fi

# 0b. Blocked-corner dense-level storage probe (exact 8x row cut on dense
#     levels, ops/hashgrid._blocked_dense_table; whether it wins depends on
#     the wide-row tier rates the gather sweep measures).
probe() {
  local log="/tmp/bench_logs/$1"; shift
  if [ -s "$log" ] && grep -q rays_per_sec "$log"; then
    echo "skip $log"; return
  fi
  if past_deadline; then echo "deadline: skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout "$(cell_timeout 2400)" python bench.py > "$log" 2>"${log%.log}.err"
  tail -1 "$log"
}
probe r3_comp_blocked.log BENCH_CONFIG=composed BENCH_DENSE_BLOCKED=1

# 1. Window ladder (512x512 = 64 chunks of 4096; INF_WINDOW=64 is the fused
#    whole image that historically faulted the worker — run it LAST so a
#    wedged client can't block the earlier cells).
inf r3_inf_w8.log  INF_WINDOW=8
inf r3_inf_w16.log INF_WINDOW=16
inf r3_inf_w32.log INF_WINDOW=32

# 2. Pre-verify the driver's exact end-of-round measurement (no env).
if ! past_deadline && [ ! -s /tmp/bench_logs/r3_final_default.log ]; then
  echo "=== final default bench ($(date +%H:%M:%S)) ==="
  timeout "$(cell_timeout 2400)" python bench.py \
    > /tmp/bench_logs/r3_final_default.log 2>/tmp/bench_logs/r3_final_default.err
  tail -1 /tmp/bench_logs/r3_final_default.log
fi

# 3. The fused whole-image fault probe, last (may wedge the client).
inf r3_inf_w64_fused.log INF_WINDOW=64

echo "QUEUE_R3F DONE $(date +%H:%M:%S)"
