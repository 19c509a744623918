#!/usr/bin/env python
"""Re-run ONLY the hard-routing (fidelity vs capacity-spill) stage of the
comprehensive evaluation and patch the experiment's
comprehensive_results.json + full_system artifact in place.

The spill trade-off rows (evaluate.py:evaluate_hard_routing) were added
after the full_system_r3 evaluation ran, so the trained artifact lacks
them; re-running the whole `--mode evaluate` would waste ~15 min of axon
compiles on unchanged stages.

Usage: python tools/rerun_hard_routing_eval.py \
           --experiment_dir experiments/full_system_r3 [--cpu] \
           [--artifact benchmarks/round_results/full_system_r3.json]
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
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (axon tunnel down / free "
                        "the chip for benches)")
    p.add_argument("--artifact", default=None,
                   help="round-results artifact to patch as well")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from adam_dehaze_tpu.config import load_config, update_checkpoint_paths
    from adam_dehaze_tpu.evaluation.evaluate import evaluate_hard_routing

    cfg_path = args.config or os.path.join(args.experiment_dir, "config.yaml")
    config = load_config(cfg_path)
    config = update_checkpoint_paths(config, args.experiment_dir)

    hard = evaluate_hard_routing(config)

    out_path = os.path.join(config["evaluation"]["results_dir"],
                            "comprehensive_results.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            comp = json.load(f)
    else:
        comp = {}
    comp["hard_routing"] = hard
    with open(out_path, "w") as f:
        json.dump(comp, f, indent=2)
    print(f"Patched {out_path}")

    if args.artifact and os.path.exists(args.artifact):
        with open(args.artifact) as f:
            art = json.load(f)
        art["hard_routing"] = hard
        with open(args.artifact, "w") as f:
            json.dump(art, f, indent=2)
        print(f"Patched {args.artifact}")


if __name__ == "__main__":
    main()
