#!/bin/bash
# Round-5 TPU queue — runs AFTER the boundary-refog classifier retrain in
# experiments/full_system_r5 completes. Serialized (1-core host; the r4
# serving regression was caused by an autotune timed under concurrent
# training). Order:
#   0. graft the retrained classifier into the r5 joint checkpoint
#   1. bench DEFAULT tier (idle host) — the driver-shaped artifact proof
#   2. joint hard-tail A/B: frac 1/6 vs 1/3 (VERDICT item 6)
#   3. detection P2 retrain + A/B vs the 3-level detector (item 7a)
#   4. loss ablations, all 5 variants on calibrated LPIPS (item 5b)
#   5. LPIPS calibration justification (CPU; item 5a)
#   6. fresh end-to-end evaluation -> full_system_r5.json (item 2)
#   7. bench --full tier (queued 3x min/median etc.; items 1+4's probes)
set -x
cd /root/repo
CFG=adam_dehaze_tpu/configs/full_system_tpu.yaml
EXP=experiments/full_system_r5
mkdir -p logs benchmarks/round_results

# --- 0. graft retrained classifier into the r5 joint checkpoint ---
timeout 1800 python tools/graft_classifier.py --experiment "$EXP" \
    > logs/graft_classifier_r5.log 2>&1 || exit 1

# --- 1. bench default tier (idle host; BENCH_EXPERIMENT defaults to r5) ---
touch /tmp/queue_timing_phase
timeout 2100 python bench.py > logs/bench_r5_default.log 2>&1
rm -f /tmp/queue_timing_phase
BLINE=$(grep -h '"metric"' logs/bench_r5_default.log | tail -n 1)
[ -n "$BLINE" ] && printf '%s\n' "$BLINE" \
    > benchmarks/round_results/bench_line_r5_default.json

# --- 2. joint hard-tail A/B (item 6): 1/6 vs 1/3, separate exp dirs ---
for FRAC in 6 3; do
    EXPH=experiments/joint_tail_r5_$FRAC
    mkdir -p "$EXPH/checkpoints"
    cp -r "$EXP/checkpoints/classifier" "$EXPH/checkpoints/" 2>/dev/null
    cp -r "$EXP/checkpoints/dehazing" "$EXPH/checkpoints/" 2>/dev/null
    python - "$FRAC" <<'EOF'
import sys, yaml
frac = 1.0 / int(sys.argv[1])
cfg = yaml.safe_load(open("experiments/full_system_r5/config.yaml"))
cfg["joint_training"]["hard_finetune_frac"] = frac
yaml.safe_dump(cfg, open(
    f"experiments/joint_tail_r5_{sys.argv[1]}/config.yaml", "w"))
EOF
    timeout 3600 python main.py --mode train_joint \
        --config "$EXPH/config.yaml" --experiment_dir "$EXPH" \
        > "logs/joint_tail_r5_$FRAC.log" 2>&1
    grep -h "\[joint\]" "logs/joint_tail_r5_$FRAC.log" \
        > "benchmarks/round_results/joint_tail_r5_$FRAC.txt" || true
done

# --- 3. detection P2 retrain (item 7a) into its own dir, then A/B ---
EXPD=experiments/detection_p2_r5
mkdir -p "$EXPD/checkpoints"
python - <<'EOF'
import yaml
cfg = yaml.safe_load(open("experiments/full_system_r5/config.yaml"))
cfg["detection"]["p2"] = True
yaml.safe_dump(cfg, open("experiments/detection_p2_r5/config.yaml", "w"))
EOF
# joint checkpoint must exist for train_detection's dehazed-input stream:
cp -r "$EXP/checkpoints/joint" "$EXPD/checkpoints/" 2>/dev/null
cp -r "$EXP/checkpoints/dehazing" "$EXPD/checkpoints/" 2>/dev/null
cp -r "$EXP/checkpoints/classifier" "$EXPD/checkpoints/" 2>/dev/null
timeout 5400 python main.py --mode train_detection \
    --config "$EXPD/config.yaml" --experiment_dir "$EXPD" \
    > logs/train_detection_p2_r5.log 2>&1
cp "$EXP/serving_autotune.json" "$EXPD/" 2>/dev/null
cp "$EXP/resolution_policy.json" "$EXPD/" 2>/dev/null
timeout 5400 python tools/rerun_detection_eval.py --experiment_dir "$EXPD" \
    > logs/detection_p2_eval_r5.log 2>&1
# adopt P2 into the r5 system iff overall mAP did not regress
python - <<'EOF' > logs/detection_p2_adopt_r5.log 2>&1
import json, os, shutil, yaml
old = json.load(open(
    "benchmarks/round_results/full_system_r4.json"))
new_path = "experiments/detection_p2_r5/results/metrics/comprehensive_results.json"
if os.path.exists(new_path):
    new = json.load(open(new_path))
    n = new["detection"]["dehazed"]
    o = old["detection"]["dehazed"]
    print("P2:", {k: n.get(k) for k in ("mAP", "mAP_small", "mAP_medium")})
    print("r4:", {k: o.get(k) for k in ("mAP", "mAP_small", "mAP_medium")})
    if n.get("mAP", 0) >= o.get("mAP", 0) - 0.005:
        shutil.rmtree("experiments/full_system_r5/checkpoints/detection",
                      ignore_errors=True)
        shutil.copytree("experiments/detection_p2_r5/checkpoints/detection",
                        "experiments/full_system_r5/checkpoints/detection")
        cfg = yaml.safe_load(open("experiments/full_system_r5/config.yaml"))
        cfg["detection"]["p2"] = True
        yaml.safe_dump(cfg,
                       open("experiments/full_system_r5/config.yaml", "w"))
        print("ADOPTED P2 detector into full_system_r5")
    else:
        print("kept 3-level detector (P2 regressed overall mAP)")
EOF

# --- 4. ablations: all five variants on calibrated heads (item 5b) ---
timeout 7200 python tools/run_ablations.py --epochs 6 \
    --data data/synthetic_corpus_v2 --lpips-weights "$EXP/lpips_cal" \
    --only full,no_perceptual,no_content,l1_only,density_weighted \
    --out benchmarks/round_results/ablations_r5.json \
    > logs/ablations_r5.log 2>&1

# --- 5. LPIPS justification (CPU) ---
timeout 3600 python tools/justify_lpips_calibration.py \
    --out benchmarks/round_results/lpips_justify_r5.json \
    > logs/lpips_justify_r5.log 2>&1

# --- 6. fresh end-to-end evaluation (item 2): one run, one artifact ---
timeout 7200 python main.py --mode evaluate \
    --config "$EXP/config.yaml" --experiment_dir "$EXP" \
    > logs/evaluate_r5.log 2>&1
cp "$EXP/results/metrics/comprehensive_results.json" \
    benchmarks/round_results/full_system_r5.json 2>/dev/null

# --- 7. bench FULL tier (idle host) ---
touch /tmp/queue_timing_phase
timeout 5400 python bench.py --full > logs/bench_r5_full.log 2>&1
rm -f /tmp/queue_timing_phase
BLINE=$(grep -h '"metric"' logs/bench_r5_full.log | tail -n 1)
[ -n "$BLINE" ] && printf '%s\n' "$BLINE" \
    > benchmarks/round_results/bench_line_r5_full.json

# --- 8. commit-able summaries from gitignored logs ---
grep -h "hard routing\|BASELINE\|fade_proxy\|brisque_proxy\|nima_proxy" \
    logs/evaluate_r5.log \
    > benchmarks/round_results/eval_r5_summary.txt 2>/dev/null || true
tail -n 8 logs/lpips_justify_r5.log \
    > benchmarks/round_results/lpips_justify_r5.txt 2>/dev/null || true
echo "QUEUE_R5 DONE"
