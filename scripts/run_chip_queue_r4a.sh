#!/bin/bash
# Round-4 queue a — the flip-decision chain (VERDICT r3 items 1-2), ordered
# by decision value per chip hour:
#   1. prodscale D3 seed 0 — the flip candidate (top1cot+lr3) priced at
#      production shape (the round-3 arm that never ran);
#   2. the SAME-PROCESS control+lr3 rerun of the lrx worst cell (all r3d
#      lrx comparisons were cross-process, ~0.25 dB noise; s0 lr3 = -0.29
#      while s1/s3/cluttered sit at -0.00/-0.02/-0.01);
#   3. the hf8 composition gate IN-CELL (lr3 vs lr3+hf8 — prices the
#      hessian-fraction halving's quality delta directly);
#   4. speed probes for the gather ladder at the flip point (hf8, slev4,
#      blocked dense — each is a later gate's candidate);
#   5. prodscale E seed 0 (equal-bytes F4 — the exact-scatter fallback);
#   6. the slev gate (sampling_levels 6/4 vs in-cell control);
#   7. gather-rate tier sweep (blocked-dense decision input);
#   8. prodscale B+D3 seed 1 (the flip's second production seed).
#
# Logs are written INSIDE the repo (docs/round4_evidence) — round 3 lost
# its unarchived /tmp logs to the between-rounds wipe (VERDICT item 8).
set -u

# Hard wall-clock deadline (epoch s): the driver benches the default config
# on the chip at round end — no queue cell may still hold the TPU client
# then. Cells are skipped once past the deadline, and in-flight timeouts
# are capped so children die before it. 1787239800 = 15:30 UTC Aug 20
# (round started ~05:18; ~1.8 h of buffer for the flip-confirm bench and
# the driver's own run).
DEADLINE=${R4_DEADLINE:-1787239800}
cell_timeout() {  # cell_timeout MAX -> min(MAX, time-to-deadline+300)
  local now rem
  now=$(date +%s)
  rem=$((DEADLINE - now + 300))
  if [ "$rem" -gt "$1" ]; then rem=$1; fi
  echo "$rem"
}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
cd "$(dirname "$0")/.."
AB=docs/round4_evidence/ab_logs
BL=docs/round4_evidence/bench_logs
mkdir -p "$AB" "$BL"

ab() {
  local log="$AB/$1"; shift
  if [ -s "$log" ] && grep -q "PSNR" "$log" && grep -q DONE "$log"; then
    echo "skip $log"; return
  fi
  if past_deadline; then echo "deadline: skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout "$(cell_timeout 14000)" python scripts/quality_ab.py > "$log" 2>&1
  tail -n 12 "$log"
}

probe() {
  local log="$BL/$1"; shift
  if [ -s "$log" ] && grep -q rays_per_sec "$log"; then
    echo "skip $log"; return
  fi
  if past_deadline; then echo "deadline: skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout "$(cell_timeout 2400)" python bench.py > "$log" 2>"${log%.log}.err"
  tail -1 "$log"
}

# 1. The flip decider: top1cot+lr3 at production shape, seed 0. The A/B/C
#    arms landed in round 3 (21.73 / 21.74 / 21.71); D3 is the candidate.
ab r4_prodscale_D3_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="D3:"

# 2. Decisive in-cell rerun of the lr3 worst cell (same process as its
#    control: kills the cross-process noise question at s0).
ab r4_lr3_incell_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="B:,c16 csamp-top1-lr3$"

# 3. hf8 composition gate, in-cell (lr3 vs lr3+hf8): prices the
#    hessian-fraction 0.25 -> 0.125 step of the gather ladder directly.
ab r4_hf8_incell_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="c16 csamp-top1-lr3$,c16 csamp-top1-lr3-hf8"

# 4. Gather-ladder speed probes at the flip point (composedcstop1 = top1cot
#    + lr3 at d19 L16; each row of the ladder gets its own fresh process).
probe r4_cstop1_confirm.log    BENCH_CONFIG=composedcstop1
probe r4_cstop1_hf8.log        BENCH_CONFIG=composedcstop1 BENCH_HESS_FRACTION=0.125
probe r4_cstop1_hf8_slev4.log  BENCH_CONFIG=composedcstop1 BENCH_HESS_FRACTION=0.125 \
  BENCH_SAMPLING_LEVELS=4
probe r4_cstop1_hf8_blk.log    BENCH_CONFIG=composedcstop1 BENCH_HESS_FRACTION=0.125 \
  BENCH_DENSE_BLOCKED=1
probe r4_cstop1_full_ladder.log BENCH_CONFIG=composedcstop1 BENCH_HESS_FRACTION=0.125 \
  BENCH_SAMPLING_LEVELS=4 BENCH_DENSE_BLOCKED=1
# The exact-path blocked-dense probe (r3f's lost cell): +23% projected on
# composed with zero semantics change.
probe r4_comp_blocked.log      BENCH_CONFIG=composed BENCH_DENSE_BLOCKED=1

# 5. prodscale E seed 0 (equal-bytes F4 dict20 — the quality-concession-free
#    fallback if the csamp family fails its production gate).
ab r4_prodscale_E_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="E:"

# 6. slev gate: in-cell control + slev=6 + slev=4 under c16 composed+cscot.
ab r4_slev16_s0.log AB_STUDY=slev16 AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere

# 7. Gather-rate tier sweep (speed-of-light remainder model input; the
#    blocked-dense decision needs the wide-row rates).
if ! past_deadline && [ ! -s "$BL/r4_gather_sweep.log" ]; then
  echo "=== gather sweep ($(date +%H:%M:%S)) ==="
  timeout "$(cell_timeout 2400)" python -u scripts/bench_gather_sweep.py \
    > "$BL/r4_gather_sweep.log" 2>&1
  tail -3 "$BL/r4_gather_sweep.log"
fi

# 8. prodscale seed 1: B (in-cell-comparable control arm) + D3.
ab r4_prodscale_B_s1.log  AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="B:"
ab r4_prodscale_D3_s1.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="D3:"

echo "QUEUE_R4A DONE $(date +%H:%M:%S)"
