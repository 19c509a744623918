#!/bin/bash
# Post-queue artifact collection for the session-5 regeneration run
# (tools/run_tpu_queue_r3d.sh). Waits for the queue PID (if given or found
# in /tmp/queue_r3d.pid), then assembles the committed evidence artifacts:
#   - benchmarks/round_results/full_system_r3.json  (evaluation summary)
#   - demo comparison grids copied into round_results
# Usage: bash tools/run_post_queue_r3d.sh [queue_pid]
set -u
cd /root/repo
EXP=experiments/full_system_r3
CFG=adam_dehaze_tpu/configs/full_system_tpu.yaml

PID=${1:-$(cat /tmp/queue_r3d.pid 2>/dev/null || echo "")}
if [ -n "$PID" ]; then
    while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi

python tools/collect_round_results.py --experiment_dir $EXP \
    --out benchmarks/round_results/full_system_r3.json

timeout 3600 python main.py --mode demo --config $CFG --experiment_dir $EXP \
    > logs/demo_r3d.log 2>&1
for f in "$EXP"/demo/*.png; do
    [ -e "$f" ] && cp "$f" benchmarks/round_results/
done

# Committed evidence the gitignored dirs would otherwise swallow: the
# serving-autotune A/B tables (dispatch decisions) and the queue's BENCH line.
[ -e "$EXP/serving_autotune.json" ] && \
    cp "$EXP/serving_autotune.json" benchmarks/round_results/serving_autotune_r3.json
grep -h '"metric"' logs/bench_r3d.log > benchmarks/round_results/bench_line_r3d.json \
    2>/dev/null || true
echo "POST_QUEUE_DONE"
