#!/bin/bash
# Poll for the axon tunnel; fire the round-3c TPU queue the moment it's
# back. Bounded at ~11h. Records its own PID in /tmp/tpu_wait.pid so the
# watcher can be stopped with `kill $(cat /tmp/tpu_wait.pid)`.
echo $$ > /tmp/tpu_wait.pid
cd /root/repo
deadline=$(( $(date +%s) + 39600 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "TPU back at $(date)"
    bash tools/run_tpu_queue_r3c.sh
    echo "WATCHER DONE"
    exit 0
  fi
  echo "tunnel still down at $(date)"
  sleep 120
done
echo "WATCHER TIMED OUT"
