#!/bin/bash
# Post-train_all pipeline for the full-system evidence run:
# detector fine-tune -> comprehensive evaluation -> round-results artifact.
# Usage: bash tools/run_post_training.sh experiments/full_system_r2
set -e
EXP=${1:-experiments/full_system_r2}
CFG=adam_dehaze_tpu/configs/full_system_tpu.yaml

python main.py --mode train_detection --config $CFG --experiment_dir $EXP
python main.py --mode evaluate --config $CFG --experiment_dir $EXP
python tools/collect_round_results.py --experiment_dir $EXP \
    --out benchmarks/round_results/full_system.json
echo POST_TRAINING_DONE
