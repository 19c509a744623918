#!/bin/bash
# Session-9 TPU queue (idle host, sequential): trained-gap decomposition,
# batch-32 fullres-remat train fit, tuned-resolution-policy test-split
# quality, then the full bench line with the guarded row.
set -x
cd /root/repo
mkdir -p logs

timeout 3000 python tools/probe_trained_gap.py \
    > logs/probe_trained_gap.log 2>&1

timeout 3000 python tools/measure_train_throughput.py --batch 32 --remat fullres \
    > logs/train_b32_fullres.log 2>&1

timeout 3000 python tools/measure_train_throughput.py --batch 24 --remat fullres \
    > logs/train_b24_fullres.log 2>&1

timeout 3600 python tools/probe_lowres.py --only full,policy_auto \
    --out benchmarks/round_results/resolution_scheduling.json \
    > logs/probe_policy_auto.log 2>&1

BENCH_BUDGET_S=2700 timeout 3000 python bench.py \
    > logs/bench_s9.log 2>&1

echo QUEUE_DONE
