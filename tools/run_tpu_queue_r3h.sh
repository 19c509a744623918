#!/bin/bash
# Round-3 session-6 queue: regenerate the trained full system (the container
# restart dropped the gitignored experiments/ + data/ dirs again), then the
# timing passes — autotune, bench, the new resolution-scheduling probe
# (tools/probe_lowres.py) and the train-throughput measurement.
#
# /tmp/queue_timing_phase exists while timing-sensitive stages run: keep the
# host idle then (timing-hygiene rule, benchmarks/PROFILE.md).
set -x
cd /root/repo
CFG=adam_dehaze_tpu/configs/full_system_tpu.yaml
EXP=experiments/full_system_r3
mkdir -p "$EXP" logs
if [ ! -d data/synthetic_corpus_v2/train ]; then
    timeout 7200 python tools/make_synthetic_corpus.py \
        --out data/synthetic_corpus_v2 --size 256 --train 250 --val 60 \
        --test 60 > logs/corpus_r3h.log 2>&1
fi
# from_experiment/autotune/bench expect a config snapshot in the dir.
cp "$CFG" "$EXP/config.yaml"
timeout 18000 python main.py --mode train_all --config "$CFG" \
    --experiment_dir "$EXP" > logs/train_all_r3h.log 2>&1
timeout 5400 python main.py --mode train_detection --config "$CFG" \
    --experiment_dir "$EXP" > logs/train_detection_r3h.log 2>&1
timeout 7200 python main.py --mode evaluate --config "$CFG" \
    --experiment_dir "$EXP" > logs/evaluate_r3h.log 2>&1
touch /tmp/queue_timing_phase
timeout 7200 python tools/autotune_serving.py > logs/autotune_r3h.log 2>&1
timeout 5400 python bench.py > logs/bench_r3h.log 2>&1
timeout 5400 python tools/probe_lowres.py > logs/probe_lowres_r3h.log 2>&1
timeout 1800 python tools/measure_train_throughput.py \
    > logs/train_throughput_r3h.log 2>&1
rm -f /tmp/queue_timing_phase
echo "QUEUE DONE"
