#!/bin/bash
# Round-3 continued: TPU measurement queue (fired by wait_tpu_and_run_queue.sh).
# Ordered by value-per-minute in case the tunnel window is short:
# 1. autotune  — writes the serving dispatch cache (chain-vs-XLA winners);
#                bench.py and the driver's end-of-round bench adopt it.
# 2. bench     — full BENCH line with the adopted dispatch.
# 3. probes    — detailed tail-chain rows (high + medium) for PROFILE/ROUND3.
set -x
cd /root/repo
timeout 7200 python tools/autotune_serving.py \
    > logs/autotune_r3c.log 2>&1
timeout 5400 python bench.py > logs/bench_r3c.log 2>&1
PROBE_STRIPS=32,16,8 timeout 7200 python tools/probe_tail.py \
    > logs/probe_tail_r3c.log 2>&1
PROBE_STRIPS=32,16,8 timeout 7200 python tools/probe_medium_tail.py \
    > logs/probe_medium_tail_r3c.log 2>&1
echo "QUEUE DONE"
