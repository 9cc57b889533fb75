#!/bin/bash
# Round-3 queue d — production-shaped quality study, seed 0 (verdict item 2).
#
# AB_STUDY=prodscale: real L16F8 dict19 model / 256-wide MLPs / bf16 tables
# (syn_prodscale_a.yaml) on the 256x256 cluttered scene, 1024 rays x 3000
# iters, one arm per process. Arms price the shipped default's deltas from
# reference semantics at production shape:
#   A exact c64h4 -> B budget c32h2 -> C composed -> D2 composed+cstop1
#   -> E composed dict20F4 (equal-bytes F-halving)
# D2 uses the top1cot draw (the round-3 flip candidate; queue r3c gates it
# on the toy cells). Seed-1 arms live in queue r3e.
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
mkdir -p /tmp/ab_logs

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
mkdir -p /tmp/bench_logs

# Adam v-hat compensation gate (flip-decisive): the sampled scatter
# inflates Adam's second moment (~1/q per coordinate), shrinking the
# effective table LR by sqrt — evidence: exact_finest=2 changed nothing
# (23.61/23.62 at s0), i.e. the top1cot gap is level-uniform. lr2/lr3 arms
# scale the table LR 2.0/2.83x; candidate-only vs TODAY's in-cell s0
# control (c16 composed = 24.04, r3_cstop1_s0.log).
ab r3_cstop1_lrx_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="c16 csamp-top1-lr2,c16 csamp-top1-lr3"

# Retry: the r3c cluttered cell died at startup with a transient TPU
# FailedPrecondition worker fault (log kept the traceback, so the skip
# check falls through and this re-runs it). The "c16 csamp-top1" selector
# substring-matches all four top1 arms (top1, xf2, lr2, lr3) — the lrx
# compensation arms are the live flip candidates; controls are the
# same-day r2q cluttered s0 = 20.31.
ab r3_cstop1_clut_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=cluttered \
   AB_VARIANTS="c16 csamp-top1"

# Re-probe top1cot speed after the one-hot selection rewrite (the r3c
# numbers 2378.3/3881.5 were measured with take_along_axis corner
# selections in the backward — static attribution showed those lower to
# +21M gather rows/step; the rewrite removes them with VPU one-hot
# contractions, math unchanged).
probe r3_cstop1oh_d19.log BENCH_CONFIG=composedcs BENCH_CORNER_MODE=top1cot \
  BENCH_TAG=onehot
probe r3_cstop1oh_d17.log BENCH_CONFIG=composedcs17 BENCH_CORNER_MODE=top1cot \
  BENCH_TAG=onehot

# F4 narrow-feature speed probes at the top1cot point (forward is
# gather-ROW-latency-bound — see PERF.md remainder analysis; F4 halves
# row bytes so dict20 keeps F8-dict19's table bytes at 2x capacity rows,
# dict18 mirrors F8-dict17's bytes). Quality: prodscale E arm + toy fhalf.
probe r3_cstop1_f4d20.log BENCH_CONFIG=composedcs BENCH_CORNER_MODE=top1cot \
  BENCH_DIM=4 BENCH_DICT_SIZE=20
probe r3_cstop1_f4d18.log BENCH_CONFIG=composedcs BENCH_CORNER_MODE=top1cot \
  BENCH_DIM=4 BENCH_DICT_SIZE=18
# ... and with the EXACT scatter (no estimator noise): if the scatter tier
# is BYTES-driven, F4 halves per-level bytes at fixed rows — a default-flip
# path that needs no csamp quality concession.
probe r3_comp_f4d19.log BENCH_CONFIG=composed BENCH_DIM=4 BENCH_DICT_SIZE=19
probe r3_comp_f4d18.log BENCH_CONFIG=composed BENCH_DIM=4 BENCH_DICT_SIZE=18

# Remainder attribution at the d19 top1cot point: how much is the exact-tap
# hessian subset (halve f), and what is the zero-table-grad ceiling?
probe r3_cstop1_hf8.log BENCH_CONFIG=composedcs BENCH_CORNER_MODE=top1cot \
  BENCH_HESS_FRACTION=0.125
probe r3_cstop1_ft.log BENCH_CONFIG=composedcs BENCH_CORNER_MODE=top1cot \
  BENCH_FREEZE=tables

# Most expensive first (fail fast on worker faults).
ab r3_prodscale_A_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="A:"
ab r3_prodscale_B_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="B:"
ab r3_prodscale_C_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="C:"
ab r3_prodscale_D3_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="D3:"
ab r3_prodscale_E_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="E:"

echo "QUEUE_R3D DONE $(date +%H:%M:%S)"
