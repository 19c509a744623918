#!/usr/bin/env python
"""Re-run ONLY the detection stage of the comprehensive evaluation and patch
the experiment's comprehensive_results.json in place.

Useful after re-fine-tuning the detector: the dehazing stages (baseline +
joint, ~15 min of axon compiles) are unchanged, so re-running the full
`--mode evaluate` would waste the compile budget.

Usage: python tools/rerun_detection_eval.py --experiment_dir experiments/X \
           [--config adam_dehaze_tpu/configs/full_system_tpu.yaml]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiment_dir", required=True)
    p.add_argument("--config", default=None)
    args = p.parse_args(argv)

    from adam_dehaze_tpu.config import load_config, update_checkpoint_paths
    from adam_dehaze_tpu.evaluation.evaluate import evaluate_object_detection

    cfg_path = args.config or os.path.join(args.experiment_dir, "config.yaml")
    config = load_config(cfg_path)
    config = update_checkpoint_paths(config, args.experiment_dir)

    detection_results = evaluate_object_detection(config)
    hazy_map = detection_results["hazy"]["overall"].get("mAP", 0.0)
    dehazed_map = detection_results["dehazed"]["overall"].get("mAP", 0.0)
    improvement = ((dehazed_map - hazy_map) / hazy_map * 100
                   if hazy_map > 0 else 0.0)
    print(f"Detection mAP hazy={hazy_map:.4f} dehazed={dehazed_map:.4f} "
          f"({improvement:+.1f}%)")

    os.makedirs(config["evaluation"]["results_dir"], exist_ok=True)
    out_path = os.path.join(config["evaluation"]["results_dir"],
                            "comprehensive_results.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            comp = json.load(f)
    else:
        comp = {}
    comp["detection"] = {
        "hazy": detection_results["hazy"]["overall"],
        "dehazed": detection_results["dehazed"]["overall"],
        "improvement_percent": improvement,
    }
    with open(out_path, "w") as f:
        json.dump(comp, f, indent=2)
    print(f"Patched {out_path}")

    det_path = os.path.join(config["evaluation"]["results_dir"],
                            "detection_results.json")
    with open(det_path, "w") as f:
        json.dump(detection_results, f, indent=2)
    print(f"Wrote {det_path}")


if __name__ == "__main__":
    main()
