#!/bin/bash
# Session-10 TPU queue: regenerate the trained full system (a container
# restart again dropped the gitignored experiments/ + data/ dirs), then the
# timing passes — serving autotune, resolution-policy tuning, test-split
# quality rows, and the bench line (now including the plan_chunks
# cost-model bucket decomposition in the fidelity trained-routing row).
#
# /tmp/queue_timing_phase exists while timing-sensitive stages run: keep the
# host idle then (timing-hygiene rule, benchmarks/PROFILE.md).
set -x
cd /root/repo
trap 'rm -f /tmp/queue_timing_phase' EXIT
CFG=adam_dehaze_tpu/configs/full_system_tpu.yaml
EXP=experiments/full_system_r3
mkdir -p "$EXP" logs
if [ ! -d data/synthetic_corpus_v2/train ]; then
    timeout 7200 python tools/make_synthetic_corpus.py \
        --out data/synthetic_corpus_v2 --size 256 --train 250 --val 60 \
        --test 60 > logs/corpus_s10.log 2>&1
fi
# from_experiment/autotune/bench expect a config snapshot in the dir.
cp "$CFG" "$EXP/config.yaml"
timeout 18000 python main.py --mode train_all --config "$CFG" \
    --experiment_dir "$EXP" > logs/train_all_s10.log 2>&1
timeout 5400 python main.py --mode train_detection --config "$CFG" \
    --experiment_dir "$EXP" > logs/train_detection_s10.log 2>&1
timeout 7200 python main.py --mode evaluate --config "$CFG" \
    --experiment_dir "$EXP" > logs/evaluate_s10.log 2>&1
touch /tmp/queue_timing_phase
timeout 7200 python tools/autotune_serving.py > logs/autotune_s10.log 2>&1
timeout 3600 python tools/autotune_resolution.py \
    > logs/autotune_resolution_s10.log 2>&1
timeout 3600 python tools/probe_lowres.py --only full,policy_auto \
    --out benchmarks/round_results/resolution_scheduling.json \
    > logs/probe_policy_auto_s10.log 2>&1
timeout 5400 python bench.py > logs/bench_s10.log 2>&1
rm -f /tmp/queue_timing_phase
echo "QUEUE DONE"
