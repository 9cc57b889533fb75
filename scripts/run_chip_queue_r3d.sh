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
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs

ab() {
  local log="/tmp/ab_logs/$1"; shift
  if [ -s "$log" ] && grep -q "PSNR" "$log" && grep -q DONE "$log"; then
    echo "skip $log"; return
  fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout 14000 python scripts/quality_ab.py > "$log" 2>&1
  tail -n 12 "$log"
}

# Most expensive first (fail fast on worker faults).
ab r3_prodscale_A_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="A:"
ab r3_prodscale_B_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="B:"
ab r3_prodscale_C_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="C:"
ab r3_prodscale_D2_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="D2:"
ab r3_prodscale_E_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="E:"

echo "QUEUE_R3D DONE $(date +%H:%M:%S)"
