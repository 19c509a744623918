#!/bin/bash
# Chain the round-4 queues: wait for phase A's train_all to finish (its
# QUEUE_R4A DONE marker in the log), then launch phase B. Bounded at ~9h.
# PID recorded in /tmp/r4_chain.pid.
echo $$ > /tmp/r4_chain.pid
cd /root/repo
deadline=$(( $(date +%s) + 32400 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  if grep -q "QUEUE_R4A DONE" logs/queue_r4a.log 2>/dev/null; then
    echo "phase A done at $(date); launching phase B"
    bash tools/run_tpu_queue_r4b.sh > logs/queue_r4b.log 2>&1
    echo "CHAIN DONE"
    exit 0
  fi
  sleep 180
done
echo "CHAIN TIMED OUT"
