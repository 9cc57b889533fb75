#!/bin/bash
# Round-3 queue e — runs after the r3d prodscale seed-0 chain, likely close
# to the deadline. REORDERED (session 3) by value per chip hour, because the
# deadline will cut the tail:
#   1. the flip-decisive SAME-PROCESS control+lr3 rerun of the lrx worst
#      cell (all r3d lrx comparisons were cross-process, ~0.25 dB noise);
#   2. gather-rate tier sweep (converts static forward-row counts to
#      seconds — the remainder-side speed-of-light input);
#   3. in-window per-op attribution at the flip candidate's operating point;
#   4. the L16 hessian.fraction=0.125 gate (passed at L12 in round 2);
#   5. seed-1 prodscale arms (B doubles as in-cell control for C/D3);
#   6. the slev16 gate.
# Cells moved here from r3f keep their log names — the ab()/probe() skip
# checks make the r3f copies no-ops.
set -u

# Hard wall-clock deadline (epoch s): the driver benches the default config
# on the chip at round end — no queue cell may still hold the TPU client
# then. Cells are skipped once past the deadline, and in-flight timeouts
# are capped so children die before it.
DEADLINE=1787185200
cell_timeout() {  # cell_timeout MAX -> min(MAX, time-to-deadline+300)
  local now rem
  now=$(date +%s)
  rem=$((DEADLINE - now + 300))
  if [ "$rem" -gt "$1" ]; then rem=$1; fi
  echo "$rem"
}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs /tmp/bench_logs

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

# 1. Decisive in-cell rerun of the lr3 worst cell (same process as its
#    control: kills the cross-process noise question at s0).
ab r3_lr3_incell_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="B:,c16 csamp-top1-lr3$"

# 2. Gather-rate tier sweep (speed-of-light remainder model input).
if ! past_deadline && [ ! -s /tmp/bench_logs/r3_gather_sweep.log ]; then
  echo "=== gather sweep ($(date +%H:%M:%S)) ==="
  timeout "$(cell_timeout 2400)" python -u scripts/bench_gather_sweep.py \
    > /tmp/bench_logs/r3_gather_sweep.log 2>&1
  tail -3 /tmp/bench_logs/r3_gather_sweep.log
fi

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

# 2b. shared=auto re-judge, EXACT arm (the round-1 rejection was an
#     800-iter mid-annealing cell; deleting the exact-hessian pass is
#     worth ~-25M rows each way — see quality_ab csamp-study comments).
#     The top1cot-lr3-auto composition arm rides the in-cell rerun above.
ab r3_auto_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="c16 auto-hshared"
probe r3_comp_auto.log BENCH_CONFIG=composed BENCH_SHARED_LEVELS=auto
probe r3_cstop1_auto.log BENCH_CONFIG=composedcstop1 BENCH_SHARED_LEVELS=auto

# 3. In-window per-op trace (scanned 16-step window; single-step profiles of
#    this workload are not representative — see verify notes).
if ! past_deadline && [ ! -s /tmp/bench_logs/r3_profile_cstop1.log ]; then
  echo "=== profile cstop1 ($(date +%H:%M:%S)) ==="
  env BENCH_CONFIG=composedcs BENCH_CORNER_MODE=top1cot PROFILE_SPD=16 \
    PROFILE_STEPS=2 timeout "$(cell_timeout 3000)" python scripts/profile_step.py \
    > /tmp/bench_logs/r3_profile_cstop1.log 2>&1
  tail -20 /tmp/bench_logs/r3_profile_cstop1.log
fi

# 4. hessian.fraction 0.25 -> 0.125 gate at the SHIPPED L16 shape (the
#    f=0.125 arm passed its multi-seed gate at L12 in round 2 but was never
#    measured at L16; static attribution: the exact-tap hessian site is a
#    full second encoder pass, so f halving cuts exact-path scatter rows
#    25% and gather rows 18%). In-cell f=0.25 control.
ab r3_hf8_s0.log AB_STUDY=hessfix AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="f=0.25,f=0.125"

# 5. Seed-1 prodscale arms.
ab r3_prodscale_B_s1.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="B:"
ab r3_prodscale_C_s1.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="C:"
ab r3_prodscale_D3_s1.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="D3:"
# E seed-1: the equal-bytes F4 arm is the quality-concession-free flip
# fallback (exact scatter) — if the r3d F4 speed probes pan out, this is
# the arm the flip decision needs at a second seed.
ab r3_prodscale_E_s1.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="E:"

# 6. slev gate: in-cell A control + slev=6 + slev=4 under c16 composed+cscot.
ab r3_slev16_s0.log AB_STUDY=slev16 AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere

echo "QUEUE_R3E DONE $(date +%H:%M:%S)"
