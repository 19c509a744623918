#!/bin/bash
# Round-3 continued (session 5): the container restart dropped the
# gitignored experiments/ + data/ dirs, so the trained full system must be
# regenerated before the measurement queue can produce trained-traffic
# rows (predicted/spill/queued routing) and an autotune cache bench can
# adopt. Order is train -> autotune -> bench -> probes so a short tunnel
# window still yields the highest-value artifacts first.
set -x
cd /root/repo
CFG=adam_dehaze_tpu/configs/full_system_tpu.yaml
EXP=experiments/full_system_r3
mkdir -p "$EXP" logs
# from_experiment/autotune/bench expect a config snapshot in the dir
# (create_experiment_dir writes one; --experiment_dir does not).
cp "$CFG" "$EXP/config.yaml"
timeout 18000 python main.py --mode train_all --config "$CFG" \
    --experiment_dir "$EXP" > logs/train_all_r3d.log 2>&1
timeout 5400 python main.py --mode train_detection --config "$CFG" \
    --experiment_dir "$EXP" > logs/train_detection_r3d.log 2>&1
timeout 7200 python main.py --mode evaluate --config "$CFG" \
    --experiment_dir "$EXP" > logs/evaluate_r3d.log 2>&1
timeout 7200 python tools/autotune_serving.py > logs/autotune_r3d.log 2>&1
timeout 5400 python bench.py > logs/bench_r3d.log 2>&1
PROBE_STRIPS=32,16,8 timeout 7200 python tools/probe_tail.py \
    > logs/probe_tail_r3d.log 2>&1
PROBE_STRIPS=32,16,8 timeout 7200 python tools/probe_medium_tail.py \
    > logs/probe_medium_tail_r3d.log 2>&1
echo "QUEUE DONE"
