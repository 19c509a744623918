#!/bin/bash
# Wait for train_all (PID in /tmp/train_all.pid), then run the post-training
# pipeline (detection fine-tune -> evaluate -> round-results artifact).
set -u
cd /root/repo
PID=$(cat /tmp/train_all.pid)
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "train_all (pid $PID) finished at $(date)" > logs/chain.log
bash tools/run_post_training.sh experiments/full_system_r2 > logs/post_training.log 2>&1
echo "post_training exit=$? at $(date)" >> logs/chain.log
