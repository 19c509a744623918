#!/usr/bin/env python
"""Assemble the full-system evidence artifact from a finished experiment.

Reads the experiment's metric JSONs (written by run_comprehensive_evaluation
and the trainers' checkpoint sidecars) and writes
benchmarks/round_results/full_system.json: per-intensity PSNR/SSIM/LPIPS for
oracle-baseline and adaptive-joint paths, classifier accuracy, routing-weight
distribution, detection hazy-vs-dehazed mAP, and the summary deltas
(reference summary semantics: evaluate.py:464-540).

Usage: python tools/collect_round_results.py --experiment_dir experiments/X \
           [--out benchmarks/round_results/full_system.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read(path):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiment_dir", required=True)
    p.add_argument("--out", default="benchmarks/round_results/full_system.json")
    args = p.parse_args(argv)

    exp = args.experiment_dir
    metrics_dir = os.path.join(exp, "results", "metrics")
    out = {
        "experiment": os.path.basename(exp.rstrip("/")),
        "baseline_oracle_routing": _read(
            os.path.join(metrics_dir, "baseline_results.json")),
        "adaptive_joint": _read(os.path.join(metrics_dir, "joint_results.json")),
        "summary": _read(os.path.join(metrics_dir, "comprehensive_results.json")),
    }

    # Classifier accuracy from the best checkpoint's metric sidecar.
    clf = _read(os.path.join(exp, "checkpoints", "classifier",
                             "best_model.metrics.json"))
    out["classifier"] = clf

    # Per-stage best dehazing PSNRs.
    out["branches"] = {}
    for level in ("low", "medium", "high"):
        m = _read(os.path.join(exp, "checkpoints", "dehazing", level,
                               "best_model.metrics.json"))
        out["branches"][level] = m
    out["joint_checkpoint"] = _read(
        os.path.join(exp, "checkpoints", "joint", "best_model.metrics.json"))
    out["detection_checkpoint"] = _read(
        os.path.join(exp, "checkpoints", "detection", "best_model.metrics.json"))

    # Routing-weight distribution on the test split (soft router weights per
    # true intensity class — shows the router actually specialises).
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np
        import yaml

        from adam_dehaze_tpu.config import load_config, update_checkpoint_paths
        from adam_dehaze_tpu.data.dataset import get_dataloader
        from adam_dehaze_tpu.evaluation.evaluate import _load_joint

        cfg_path = os.path.join(exp, "config.yaml")
        config = load_config(cfg_path) if os.path.exists(cfg_path) else load_config()
        config = update_checkpoint_paths(config, exp)
        router, state = _load_joint(config)
        apply_fn = jax.jit(lambda v, x: router.apply(v, x, train=False))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        sums = np.zeros((3, 3))
        counts = np.zeros(3)
        correct = 0
        total = 0
        for batch in get_dataloader(config, "test"):
            _, info = apply_fn(variables, jnp.asarray(batch["hazy"]))
            w = np.asarray(info.get("weights", info.get("gate_weights")))
            lab = np.asarray(batch["intensity"])
            mask = np.asarray(batch["mask"], bool)
            for c in range(3):
                sel = (lab == c) & mask
                sums[c] += w[sel].sum(axis=0)
                counts[c] += sel.sum()
            if "logits" in info and info["logits"] is not None:
                pred = np.asarray(jnp.argmax(info["logits"], axis=1))
                correct += int(((pred == lab) & mask).sum())
                total += int(mask.sum())
        dist = {f"true_{name}": [round(float(v), 4) for v in sums[c] / max(counts[c], 1)]
                for c, name in enumerate(("low", "medium", "high"))}
        out["routing_weight_distribution"] = {
            "order": ["w_low", "w_medium", "w_high"], **dist}
        if total:
            out["router_classifier_test_acc"] = round(correct / total, 4)
    except Exception as e:  # artifact assembly should never hard-fail
        out["routing_weight_distribution"] = f"unavailable: {e}"

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
