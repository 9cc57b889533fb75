#!/bin/bash
# Round-3 queue b — SUPERSEDED before it ran: the top1cot draw (queue r3c)
# jumped the priority queue once the cotangent gates came in borderline
# (-0.61/-0.32 dB), so the prodscale chain moved to run_chip_queue_r3d.sh
# (seed 0, with the D2 top1cot arm + E equal-bytes F4 arm) and
# run_chip_queue_r3e.sh (seed 1 + slev gate), driven by
# run_chip_queue_r3_master.sh. Kept for the audit trail.
#
# AB_STUDY=prodscale: real L16F8 dict19 model / 256-wide MLPs / bf16 tables
# (syn_prodscale_a.yaml) on the 256x256 cluttered scene, 1024 rays x 3000
# iters, one arm per process. Arms price the shipped default's deltas from
# reference semantics at production shape:
#   A exact c64h4  ->  B budget c32h2  ->  C composed  ->  D composed+cscot
# Seed 0 runs the full chain; seed 1 re-runs B/C/D (the stencil and csamp
# deltas — historically the seed-sensitive knobs; A@seed1 is priced out of
# the chip budget, so seed-1 deltas read against B as in-cell control).
#
# Waits for queue r3a (csamp-cot gates) to finish — ONE TPU client at a time.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs

while [ ! -f /tmp/queue_r3a_run.log ] || ! grep -q "QUEUE_R3A DONE" /tmp/queue_r3a_run.log; do
  sleep 60
done

ab() {
  local log="/tmp/ab_logs/$1"; shift
  if [ -s "$log" ] && grep -q "PSNR" "$log" && grep -q DONE "$log"; then
    echo "skip $log"; return
  fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" timeout 14000 python scripts/quality_ab.py > "$log" 2>&1
  tail -n 12 "$log"
}

# Seed 0: full chain, most expensive first (fail fast on worker faults).
ab r3_prodscale_A_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="A:"
ab r3_prodscale_B_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="B:"
ab r3_prodscale_C_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="C:"
ab r3_prodscale_D_s0.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=0 AB_VARIANTS="D:"

# Seed 1: B/C/D (B doubles as the in-cell control for the C/D deltas).
ab r3_prodscale_B_s1.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="B:"
ab r3_prodscale_C_s1.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="C:"
ab r3_prodscale_D_s1.log AB_STUDY=prodscale AB_ITERS=3000 AB_SEED=1 AB_VARIANTS="D:"

echo "QUEUE_R3B DONE $(date +%H:%M:%S)"
