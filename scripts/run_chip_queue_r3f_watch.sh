#!/bin/bash
# Waits for the running round-3 master queue to finish, then runs queue r3f.
# Separate watcher because the master is a live bash process (its stage list
# cannot be edited in place); ONE TPU client at a time is preserved by
# waiting on the master's DONE marker.
set -u
cd "$(dirname "$0")/.."
while ! grep -qs "QUEUE_R3_MASTER DONE" /tmp/queue_r3_master.log; do
  sleep 60
done
bash scripts/run_chip_queue_r3f.sh >> /tmp/queue_r3f_run.log 2>&1
echo "QUEUE_R3F_WATCH DONE $(date +%H:%M:%S)"
