#!/bin/bash
# Round-5 e2e continuation v2. Step 2's 900 s cap was also too tight once
# real per-(cam,light) render timing landed (~60 s/dir x 12 dirs + ~8 min
# compile), and a timeout-kill + auto-retry there risks overlapping TPU
# clients — so the step-2 timeout was defused the same way as stage-a's
# (kill of the `timeout` wrapper only) and this script waits for the
# render python to exit before driving steps 3-7 with generous caps.
set -u
cd "$(dirname "$0")/.."
EV=docs/round5_evidence/e2e
LOG="$EV/pipeline.log"
step() { echo "=== $* ($(date +%H:%M:%S)) ===" | tee -a "$LOG"; }
run() {
  local cap=$1 desc=$2; shift 2
  step "$desc"
  if timeout "$cap" "$@" >> "$LOG" 2>&1; then return 0; fi
  local rc=$?
  step "RETRY ($desc; rc=$rc) — 90 s worker settle"
  sleep 90
  timeout "$cap" "$@" >> "$LOG" 2>&1
}

while kill -0 2967 2>/dev/null; do sleep 15; done
sleep 30   # worker settle after client exit

run 900 "3/7 pseudo labels (unpair)" \
  python -m mlinerf_tpu.pipelines.pseudo_label \
    --workdir logs/syn_e2e_a/output_unpairlights_train --setting unpair || exit 1

run 2400 "4/7 stage-b train (syn_e2e_b, 1000 iters, warm start + partial grad)" \
  python train.py --logdir=logs/syn_e2e_b --config=configs/syn_e2e_b.yaml || exit 1

run 1500 "5/7 image_test (RGB + intrinsic component maps)" \
  python test.py --config=configs/syn_e2e_b.yaml --logdir=logs/syn_e2e_b \
    --inference_mode image_test || exit 1

step "6/7 metrics JSON (PSNR/SSIM/MSE; LPIPS gated on vendored weights)"
timeout 600 python -m mlinerf_tpu.pipelines.metrics --config=configs/syn_e2e_b.yaml \
    --output_dir logs/syn_e2e_b/output_image --components rgb,ref,sha \
    --allow_missing_lpips > "$EV/metrics.json" 2>> "$LOG" || true
for f in logs/syn_e2e_b/output_image/0_rgb_map.png \
         logs/syn_e2e_b/output_image/0_o_r_map.png \
         logs/syn_e2e_b/output_image/0_o_s_map.png \
         logs/syn_e2e_b/output_image/0_gt.png; do
  [ -f "$f" ] && cp -f "$f" "$EV/" || true
done
echo "E2E CORE DONE $(date +%H:%M:%S)" | tee -a "$LOG"

run 1200 "7a relighting video (cameras 0 -> 3)" \
  python test.py --config=configs/syn_e2e_b.yaml --logdir=logs/syn_e2e_b \
    --inference_mode video_test_0_3 || true
cp -f logs/syn_e2e_b/output_video/video_0_3.mp4 "$EV/" 2>/dev/null || true
run 1200 "7b mesh extraction" \
  python scripts/extract_mesh.py --config=configs/syn_e2e_b.yaml \
    --logdir=logs/syn_e2e_b --resolution 192 --block_res 96 \
    --output_file "$EV/mesh.ply" || true
echo "E2E DONE $(date +%H:%M:%S)" | tee -a "$LOG"
