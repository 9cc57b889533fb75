#!/bin/bash
# Round-4 queue d — resumed session. r4b died mid-prodscale-I (the ladder-top
# flip decider) and r4c never started. Priorities, in order:
#   1. prodscale I (composed+auto+slev4, 3664.4 rays/s measured): if it holds
#      the 0.2 dB bar the default flips to composedautoslev4blk.
#   2. mesh=rays vs mesh=none same-session probes: the c0 constant for the
#      PERF.md scaling model (round-3 verdict item 3).
#   3. Inference window ladder (w8/16/32) at the shipped default.
#   4. Seed-1 production gate for whichever arm carries the default after I
#      (adaptive: I if it passed, else G).
#   5. Occupancy prove-or-retire on the cluttered scene.
#   6. Stage-b component-PSNR A/B (toy mirror, full two-stage pipeline).
#   7. Deadline-gated tail: E arm, 512x512 prodscale arm, csamp postmortems.
set -u
DEADLINE=${R4_DEADLINE:-$(( $(date +%s) + 11400 ))}
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

# 1. The flip decider. (The 11:07 attempt died with the session; the ab()
#    skip-guard sees no PSNR/DONE so it reruns.)
rm -f "$AB/r4_prodscale_I_s0.log"
ab r4_prodscale_I_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="I:"

# 2. Sharding-constraint overhead c0 (same-session pair, fresh processes).
probe r4_comp_mesh_rays.log BENCH_SKIP_RENDER=1 BENCH_CONFIG=composed
probe r4_comp_mesh_none.log BENCH_SKIP_RENDER=1 BENCH_CONFIG=composed BENCH_MESH=none

# 3. Inference window ladder at the shipped default.
inf r4_inf_w8.log  INF_WINDOW=8
inf r4_inf_w16.log INF_WINDOW=16
inf r4_inf_w32.log INF_WINDOW=32

# 4. Adaptive seed-1 gate: I's arm if it passed (PSNR >= 21.53 on the A=21.73
#    scale), else G (the shipped composedhf8slev4blk arm).
S1_ARM="G"
IPSNR=$(grep -o "PSNR = [0-9.]*" "$AB/r4_prodscale_I_s0.log" 2>/dev/null | tail -1 | grep -o "[0-9.]*$")
if [ -n "${IPSNR:-}" ] && python -c "import sys; sys.exit(0 if float('$IPSNR') >= 21.53 else 1)"; then
  S1_ARM="I"
fi
echo "seed-1 arm: $S1_ARM (I s0 PSNR=${IPSNR:-none})"
ab "r4_prodscale_${S1_ARM}_s1.log" AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="${S1_ARM}:"

# 5. Occupancy prove-or-retire: equal-budget uniform control, cluttered scene.
ab r4_occ_clut_s0.log AB_STUDY=occ AB_ITERS=2000 AB_SEED=0 AB_SCENE=cluttered

# 6. Stage-b component-PSNR A/B (toy mirror of C vs the hf8 arm; full
#    two-stage pipeline per arm: stage-a train -> light renders ->
#    pseudo-labels -> warm-started stage b; RGB + Ref + Sha PSNR).
ab r4_stageb_CF_s0.log AB_STUDY=prodscale AB_STAGEB=1 AB_ITERS=2000 AB_ITERS_B=1000 \
   AB_SEED=0 AB_BASE_CONFIG=syn_sphere_a.yaml AB_VARIANTS="C:,F:"

echo "QUEUE_R4D DONE $(date +%H:%M:%S)"

# 7. Tail (deadline-gated, cheapest-information-first).
ab r4_prodscale_E_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="E:"
ab r4_prodscale512_BF_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 \
   AB_IMAGE_SIZE=512 AB_VARIANTS="B:,F:"
if ! past_deadline && [ ! -s "$BL/r4_gather_sweep.log" ]; then
  echo "=== gather sweep ($(date +%H:%M:%S)) ==="
  timeout "$(cell_timeout 2400)" python -u scripts/bench_gather_sweep.py \
    > "$BL/r4_gather_sweep.log" 2>&1
  tail -3 "$BL/r4_gather_sweep.log"
fi
ab r4_hf8_incell_s0.log AB_STUDY=csamp AB_ITERS=2000 AB_SEED=0 AB_SCENE=sphere \
   AB_VARIANTS="c16 csamp-top1-lr3$,c16 csamp-top1-lr3-hf8"

echo "QUEUE_R4D TAIL DONE $(date +%H:%M:%S)"
