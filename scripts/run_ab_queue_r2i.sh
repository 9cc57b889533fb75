#!/bin/bash
# Round-2 continuation queue i: CLUTTERED-SCENE stress gates for the default
# candidate. The single-sphere gates are necessary-but-not-sufficient for
# capacity/budget cuts (STATUS.md); this queue re-runs the decisive
# composed12 study (prod-shaped control + the f=0.125 composition) on the
# multi-object hard-shadow scene (AB_SCENE=cluttered, data/synthetic.py)
# at both gate seeds. Verdicts use the same 0.2 dB in-cell-delta bar.
# One TPU client at a time — run only after bench measurements finish.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_logs
run() {
  local log="/tmp/ab_logs/$1"; shift
  if [ -s "$log" ] && grep -q "PSNR" "$log" && grep -q DONE "$log"; then
    echo "skip $log"; return
  fi
  echo "=== $log ($(date +%H:%M:%S)) ==="
  env "$@" python scripts/quality_ab.py > "$log" 2>&1
  tail -n 8 "$log"
}
run c12_clut_s0.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=0 \
    AB_SCENE=cluttered AB_VARIANTS="A:,f=0.125"
run c12_clut_s1.log AB_STUDY=composed12 AB_ITERS=2000 AB_SEED=1 \
    AB_SCENE=cluttered AB_VARIANTS="A:,f=0.125"
echo "QUEUE_R2I DONE $(date +%H:%M:%S)"
