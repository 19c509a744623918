#!/bin/bash
# Round-4 phase-B TPU queue: runs AFTER tools/run_tpu_queue_r4a.sh's
# train_all completes. Order matters:
#   1. joint A/B: re-run the joint stage with the hard fine-tune tail
#      (VERDICT item 5) from the same stage checkpoints, into a SEPARATE
#      experiment dir so the soft-only phase-A joint stays the system of
#      record until the A/B is judged.
#   2. detection training (improved recipe) + LPIPS calibration (CPU).
#   3. serving + resolution autotunes (idle host during timing).
#   4. evaluation (quality artifact incl. spill_up + baseline_comparison).
#   5. FLOPs audit (CPU) then bench (TPU, idle host).
set -x
cd /root/repo
trap 'rm -f /tmp/queue_timing_phase' EXIT
CFG=adam_dehaze_tpu/configs/full_system_tpu.yaml
EXP=experiments/full_system_r3
EXPH=experiments/joint_hard_r4
mkdir -p "$EXPH/checkpoints" logs benchmarks/round_results

# --- 1. joint hard-finetune A/B (reuses phase-A stage checkpoints) ---
if [ -d "$EXP/checkpoints/dehazing/high/best_model" ]; then
    cp -r "$EXP/checkpoints/classifier" "$EXPH/checkpoints/" 2>/dev/null
    cp -r "$EXP/checkpoints/dehazing" "$EXPH/checkpoints/" 2>/dev/null
    python - <<'EOF' > logs/joint_hard_r4.log 2>&1
import yaml, copy
cfg = yaml.safe_load(open("adam_dehaze_tpu/configs/full_system_tpu.yaml"))
cfg["joint_training"]["hard_finetune_frac"] = 0.5  # 3 of 6 epochs hard
with open("experiments/joint_hard_r4/config.yaml", "w") as f:
    yaml.safe_dump(cfg, f)
EOF
    timeout 7200 python main.py --mode train_joint \
        --config "$EXPH/config.yaml" --experiment_dir "$EXPH" \
        >> logs/joint_hard_r4.log 2>&1
fi

# --- 2. detection (improved recipe) + LPIPS calibration ---
timeout 7200 python main.py --mode train_detection --config "$CFG" \
    --experiment_dir "$EXP" > logs/train_detection_r4.log 2>&1
timeout 3600 python tools/calibrate_lpips.py \
    --corpus data/synthetic_corpus_v2 --out "$EXP/lpips_cal" \
    > logs/lpips_cal_r4.log 2>&1

# --- 2b. margin-aware up-routing probe (val-calibrated tau, test report) ---
timeout 3600 python tools/probe_margin_routing.py --experiment "$EXP" \
    > logs/margin_routing_r4.log 2>&1
cp "$EXP/margin_routing.json" \
    benchmarks/round_results/margin_routing_r4.json 2>/dev/null

# --- 3. autotunes (timing phases: host must stay idle) ---
touch /tmp/queue_timing_phase
timeout 5400 python tools/autotune_serving.py --experiment "$EXP" \
    > logs/autotune_serving_r4.log 2>&1
timeout 5400 python tools/autotune_resolution.py --experiment "$EXP" \
    > logs/autotune_resolution_r4.log 2>&1
rm -f /tmp/queue_timing_phase

# --- 4. evaluation (wire the calibrated LPIPS in via a derived config) ---
python - <<'EOF' > logs/eval_cfg_r4.log 2>&1
import yaml
cfg = yaml.safe_load(open("adam_dehaze_tpu/configs/full_system_tpu.yaml"))
cfg.setdefault("loss", {})["lpips_weights"] = \
    "experiments/full_system_r3/lpips_cal"
with open("experiments/full_system_r3/config.yaml", "w") as f:
    yaml.safe_dump(cfg, f)
EOF
timeout 7200 python main.py --mode evaluate \
    --config "$EXP/config.yaml" --experiment_dir "$EXP" \
    > logs/evaluate_r4.log 2>&1
cp "$EXP/results/metrics/comprehensive_results.json" \
    benchmarks/round_results/full_system_r4.json 2>/dev/null

# --- 5. FLOPs audit (CPU) then bench (TPU, idle host) ---
timeout 1800 python tools/audit_flops.py --config "$CFG" \
    --experiment "$EXP" > logs/audit_flops_r4.log 2>&1
touch /tmp/queue_timing_phase
timeout 3600 python bench.py > logs/bench_r4b.log 2>&1
rm -f /tmp/queue_timing_phase
BLINE=$(grep -h '"metric"' logs/bench_r4b.log 2>/dev/null | tail -n 1)
if [ -n "$BLINE" ]; then
    printf '%s\n' "$BLINE" > benchmarks/round_results/bench_line_r4b.json
else
    echo "ERROR: no bench line in logs/bench_r4b.log" >&2
fi
# --- 5a. compute-bound train-throughput A/B: 3x soft step vs hard
#      per-branch steps (in-memory batches; the epoch wall-clock is
#      host-bound on this 1-core VM so only this isolates the FLOPs win) ---
touch /tmp/queue_timing_phase
timeout 3600 python tools/measure_train_throughput.py --batch 24 \
    --mode hard > logs/train_tp_hard_r4.log 2>&1
rm -f /tmp/queue_timing_phase
grep -h '"metric"' logs/train_tp_hard_r4.log | tail -n 1 \
    > benchmarks/round_results/train_tp_hard_r4.json || true

# --- 5b. loss ablations with the CALIBRATED perceptual metric (r3 item 3:
#      the no_perceptual row is only meaningful against fitted heads) ---
timeout 7200 python tools/run_ablations.py --epochs 6 \
    --data data/synthetic_corpus_v2 --lpips-weights "$EXP/lpips_cal" \
    --out benchmarks/round_results/ablations_r4.json \
    > logs/ablations_r4.log 2>&1

# --- 6. commit-able artifacts from gitignored logs/experiments ---
grep -h "\[joint\]" logs/joint_hard_r4.log \
    > benchmarks/round_results/joint_hard_r4.txt 2>/dev/null || true
grep -h "\[joint\]" logs/train_all_r4a.log | tail -n 20 \
    > benchmarks/round_results/joint_soft_r4a.txt 2>/dev/null || true
grep -h "\[detection\]\|hard routing\|BASELINE" logs/train_detection_r4.log \
    logs/evaluate_r4.log > benchmarks/round_results/eval_r4_summary.txt \
    2>/dev/null || true
tail -n 5 logs/lpips_cal_r4.log \
    > benchmarks/round_results/lpips_cal_r4.txt 2>/dev/null || true
cp "$EXP/resolution_policy.json" \
    benchmarks/round_results/resolution_policy_r4.json 2>/dev/null || true
cp "$EXP/serving_autotune.json" \
    benchmarks/round_results/serving_autotune_r4.json 2>/dev/null || true
cp benchmarks/flops_audit.json \
    benchmarks/round_results/flops_audit_r4.json 2>/dev/null || true
echo "QUEUE_R4B DONE"
