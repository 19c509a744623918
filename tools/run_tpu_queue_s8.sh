#!/bin/bash
# Session-8 TPU queue: collect the r3h artifacts the interrupted session-7
# left behind, then refresh the measured lines with the new serving rows.
# Runs strictly sequentially (timing hygiene: serving A/B numbers are only
# valid on an idle host — PROFILE.md session-5 note).
#   1. Post-queue collection for the r3h regeneration run (full_system_r3
#      artifact + demo grids + bench/train-throughput line copies).
#   2. bench.py refresh: picks up the lowres_medhigh row and the autotuned
#      dispatch on the trained experiment.
#   3. Joint-train throughput at batch 32 (the committed 29% MFU row is
#      batch 16; larger batches amortize the BN/elementwise stages).
# Usage: bash tools/run_tpu_queue_s8.sh  (detached; writes logs/ + artifacts)
set -ux
cd /root/repo

bash tools/run_post_queue_r3h.sh "" > logs/post_queue_s8.log 2>&1

BENCH_AUTOTUNE=1 timeout 5400 python bench.py > logs/bench_s8.log 2>&1
grep -h '"metric"' logs/bench_s8.log \
    > benchmarks/round_results/bench_line_r3i.json 2>/dev/null || true

timeout 3600 python tools/measure_train_throughput.py --batch 32 \
    > logs/train_throughput_b32.log 2>&1
grep -h '"metric"' logs/train_throughput_b32.log \
    > benchmarks/round_results/train_throughput_b32.json 2>/dev/null || true

echo "S8 QUEUE DONE"
