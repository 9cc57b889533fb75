#!/bin/bash
# Round-4 queue b — REPLAN after the D3 production-shape failure.
#
# r4a's first cell landed prodscale D3 s0 = 20.97 dB vs A/C 21.73/21.71
# (-0.76, 3x the cross-process noise): the top1cot+lr3 csamp family is
# quality-DEAD at production shape despite its toy-ledger near-passes. The
# flip chain moves to the EXACT-scatter ladder — hf8 (hessian fraction
# halving), auto-hshared (deletes the hessian pass), slev4 (PDF-eval level
# truncation), blocked dense (exact row restructure) — priced by speed
# probes first, then gated DIRECTLY at production shape (prodscale F/G/H/I
# arms), since D3 proved toy cells under-predict production failures.
set -u
DEADLINE=${R4_DEADLINE:-1787239800}
cell_timeout() {
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

# Wait for any in-flight TPU client handed over from r4a (pid via $1).
if [ "${1:-}" != "" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
fi

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

inf() {
  local log="$BL/$1"; shift
  if [ -s "$log" ] && grep -q rays_per_sec "$log"; then
    echo "skip $log"; return
  fi
  if past_deadline; then echo "deadline: skip $log"; return; fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout "$(cell_timeout 1800)" python scripts/bench_inference.py \
    > "$log" 2>"${log%.log}.err"
  tail -1 "$log"
}

# 1. Exact-ladder speed probes (each its own fresh process; render skipped —
#    these are train-rate measurements, the final default probe carries the
#    render number).
probe r4_comp_hf8.log            BENCH_SKIP_RENDER=1 BENCH_CONFIG=composed BENCH_HESS_FRACTION=0.125
probe r4_comp_auto.log           BENCH_SKIP_RENDER=1 BENCH_CONFIG=composed BENCH_SHARED_LEVELS=auto
probe r4_comp_hf8_slev4.log      BENCH_SKIP_RENDER=1 BENCH_CONFIG=composed BENCH_HESS_FRACTION=0.125 \
  BENCH_SAMPLING_LEVELS=4
probe r4_comp_hf8_slev4_blk.log  BENCH_SKIP_RENDER=1 BENCH_CONFIG=composed BENCH_HESS_FRACTION=0.125 \
  BENCH_SAMPLING_LEVELS=4 BENCH_DENSE_BLOCKED=1
probe r4_comp_blocked.log        BENCH_SKIP_RENDER=1 BENCH_CONFIG=composed BENCH_DENSE_BLOCKED=1
probe r4_comp_auto_slev4_blk.log BENCH_SKIP_RENDER=1 BENCH_CONFIG=composed BENCH_SHARED_LEVELS=auto \
  BENCH_SAMPLING_LEVELS=4 BENCH_DENSE_BLOCKED=1

# 2. Production-shape gates for the ladder (the flip deciders). F/H first —
#    whichever passes at the better measured rate carries the default.
ab r4_prodscale_F_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="F:"
ab r4_prodscale_H_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="H:"
ab r4_prodscale_G_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="G:"
ab r4_prodscale_I_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="I:"

# 3. Single-chip sharding-overhead bound (round-3 verdict item 3): composed
#    with the default rays mesh vs NO mesh in same-day fresh processes.
probe r4_comp_mesh_rays.log BENCH_SKIP_RENDER=1 BENCH_CONFIG=composed
probe r4_comp_mesh_none.log BENCH_SKIP_RENDER=1 BENCH_CONFIG=composed BENCH_MESH=none

# 4. Equal-bytes F4 capacity arm (exact scatter; quality headroom for real
#    scenes — speed-neutral, r3d measured F4d19 == F8d19).
ab r4_prodscale_E_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="E:"

# 5. Occupancy prove-or-retire (round-3 verdict item 8): equal-budget
#    uniform controls on the CLUTTERED scene where empty-space skipping
#    should actually matter; second null/negative -> attic.
ab r4_occ_clut_s0.log AB_STUDY=occ AB_ITERS=2000 AB_SEED=0 AB_SCENE=cluttered

# 6. Seed-1 production gate for the winning exact arm (F unless H passed
#    and measured faster — harvest adaptively; F is queued, H via rerun).
ab r4_prodscale_F_s1.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="F:"

# 7. Inference window ladder (r3f's lost cells) at the shipped default.
inf r4_inf_w8.log  INF_WINDOW=8
inf r4_inf_w16.log INF_WINDOW=16
inf r4_inf_w32.log INF_WINDOW=32

# 8. Gather-rate tier sweep (blocked-dense / remainder model input).
if ! past_deadline && [ ! -s "$BL/r4_gather_sweep.log" ]; then
  echo "=== gather sweep ($(date +%H:%M:%S)) ==="
  timeout "$(cell_timeout 2400)" python -u scripts/bench_gather_sweep.py \
    > "$BL/r4_gather_sweep.log" 2>&1
  tail -3 "$BL/r4_gather_sweep.log"
fi

# 9. csamp postmortem (toy in-cell cells; the production verdict is already
#    in — these attribute WHERE the toy ledger under-predicted).
ab r4_hf8_incell_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="c16 csamp-top1-lr3$,c16 csamp-top1-lr3-hf8"
ab r4_prodscale_B_s1.log  AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="B:"
ab r4_prodscale_D3_s1.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="D3:"

true # moved to tail: echo "QUEUE_R4B DONE $(date +%H:%M:%S)"

# 10. lr3 in-cell s0 (killed mid-run when the D3 production verdict landed;
#     postmortem completeness only).
ab r4_lr3_incell_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="B:,c16 csamp-top1-lr3$"

echo "QUEUE_R4B TAIL DONE $(date +%H:%M:%S)"
