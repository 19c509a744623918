#!/bin/bash
# Post-queue artifact collection for the session-10 regeneration run
# (tools/run_tpu_queue_s10.sh). Waits for the queue PID (if given or found
# in /tmp/queue_s10.pid), then assembles the committed evidence artifacts:
#   - benchmarks/round_results/full_system_r3.json  (evaluation summary)
#   - benchmarks/round_results/bench_line_s10.json  (BENCH JSON line, now
#     including the plan_chunks cost-model decomposition in the fidelity
#     trained-routing row)
#   - serving_autotune_r3.json refresh + demo comparison grids
# (resolution_scheduling.json / resolution_policy_r3.json are written by
# tools/probe_lowres.py and tools/autotune_resolution.py directly.)
# Usage: bash tools/run_post_queue_s10.sh [queue_pid]
set -u
cd /root/repo
EXP=experiments/full_system_r3
CFG=adam_dehaze_tpu/configs/full_system_tpu.yaml

PID=${1:-$(cat /tmp/queue_s10.pid 2>/dev/null || echo "")}
if [ -n "$PID" ]; then
    while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi

python tools/collect_round_results.py --experiment_dir $EXP \
    --out benchmarks/round_results/full_system_r3.json

timeout 3600 python main.py --mode demo --config $CFG --experiment_dir $EXP \
    > logs/demo_s10.log 2>&1
for f in "$EXP"/demo/*.png; do
    [ -e "$f" ] && cp "$f" benchmarks/round_results/
done

[ -e "$EXP/serving_autotune.json" ] && \
    cp "$EXP/serving_autotune.json" benchmarks/round_results/serving_autotune_r3.json
# Last matching line only (an emergency-dump line can precede the final
# one); fail loudly instead of committing an empty artifact.
BLINE=$(grep -h '"metric"' logs/bench_s10.log 2>/dev/null | tail -n 1)
if [ -n "$BLINE" ]; then
    printf '%s\n' "$BLINE" > benchmarks/round_results/bench_line_s10.json
else
    echo "ERROR: no bench line found in logs/bench_s10.log" >&2
fi
echo "POST_QUEUE_DONE"
