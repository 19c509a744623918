#!/bin/bash
# Round-4 phase-A TPU queue: regenerate corpus + the trained full system
# (container restart dropped gitignored experiments/ + data/ again).
# Detection training, evaluation, autotunes and bench run in phase B, after
# the round-4 detection-training improvements land (VERDICT item 4) so the
# regenerated detector benefits from them.
set -x
cd /root/repo
trap 'rm -f /tmp/queue_timing_phase' EXIT
CFG=adam_dehaze_tpu/configs/full_system_tpu.yaml
EXP=experiments/full_system_r3
mkdir -p "$EXP" logs
if [ ! -d data/synthetic_corpus_v2/train ]; then
    timeout 7200 python tools/make_synthetic_corpus.py \
        --out data/synthetic_corpus_v2 --size 256 --train 250 --val 60 \
        --test 60 > logs/corpus_r4a.log 2>&1
fi
# from_experiment/autotune/bench expect a config snapshot in the dir.
cp "$CFG" "$EXP/config.yaml"
timeout 18000 python main.py --mode train_all --config "$CFG" \
    --experiment_dir "$EXP" > logs/train_all_r4a.log 2>&1
echo "QUEUE_R4A DONE"
