#!/bin/bash
# Round-3 master chip driver: waits for queue r3a (cotangent gates), then
# runs r3c (top1cot flip gates) -> r3d (prodscale seed 0) -> r3e (extras).
# Each stage is a separate script read fresh at invocation, so later stages
# can be edited while earlier ones run. ONE TPU client at a time throughout.
set -u
cd "$(dirname "$0")/.."
while [ ! -f /tmp/queue_r3a_run.log ] || ! grep -q "QUEUE_R3A DONE" /tmp/queue_r3a_run.log; do
  sleep 60
done
bash scripts/run_chip_queue_r3c.sh >> /tmp/queue_r3c_run.log 2>&1
bash scripts/run_chip_queue_r3d.sh >> /tmp/queue_r3d_run.log 2>&1
bash scripts/run_chip_queue_r3e.sh >> /tmp/queue_r3e_run.log 2>&1
echo "QUEUE_R3_MASTER DONE $(date +%H:%M:%S)"
