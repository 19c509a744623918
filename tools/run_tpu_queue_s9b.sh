#!/bin/bash
# Session-9 follow-up: does FULL remat fit batch-32 joint training, and does
# its throughput beat batch-24 plain? (fullres twins measured negative for
# peak HBM — logs/train_b{24,32}_fullres.log.)
set -x
cd /root/repo
mkdir -p logs

timeout 3000 python tools/measure_train_throughput.py --batch 32 --remat full \
    > logs/train_b32_full.log 2>&1

timeout 3000 python tools/measure_train_throughput.py --batch 24 --remat none \
    > logs/train_b24_plain.log 2>&1

echo QUEUE_B_DONE
