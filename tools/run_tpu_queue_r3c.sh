#!/bin/bash
# Round-3 continued: TPU measurement queue (fire once the axon tunnel is back).
# 1. tail probe with chain rows (strips 16,8) -> logs/probe_tail_r3c.log
# 2. full bench with the new fields        -> logs/bench_r3c.log
set -x
cd /root/repo
PROBE_STRIPS=32,16,8 timeout 7200 python tools/probe_tail.py \
    > logs/probe_tail_r3c.log 2>&1
PROBE_STRIPS=32,16,8 timeout 7200 python tools/probe_medium_tail.py \
    > logs/probe_medium_tail_r3c.log 2>&1
timeout 7200 python tools/autotune_serving.py \
    > logs/autotune_r3c.log 2>&1
BENCH_AUTOTUNE=1 timeout 5400 python bench.py > logs/bench_r3c.log 2>&1
echo "QUEUE DONE"
