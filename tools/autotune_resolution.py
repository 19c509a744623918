#!/usr/bin/env python
"""Tune the quality-guarded resolution policy for a trained experiment.

Measures, per branch, full resolution vs the lowres guided-lift candidates
(resolution_autotune.py) on the experiment's VAL split — held out from the
test numbers every artifact reports — and caches the winning dispatch in
`<experiment>/resolution_policy.json`. Serving consumes it via
`dehazer.route_hard(images, lowres="auto")`.

Run on an IDLE host (timing-hygiene rule, benchmarks/PROFILE.md).

Usage: python tools/autotune_resolution.py
           [--experiment experiments/full_system_r3]
           [--floor-db 0.0] [--batch 16]
           [--out benchmarks/round_results/resolution_policy_r3.json]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiment", default="experiments/full_system_r3")
    p.add_argument("--floor-db", type=float, default=0.0)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--split", default="val",
                   help="probe split (val; never tune on test)")
    p.add_argument("--out",
                   default="benchmarks/round_results/resolution_policy_r3.json")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--no-autotune", action="store_true",
                   help="probe the default dispatch instead of the "
                        "serving-autotune winners")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from adam_dehaze_tpu.data.dataset import get_dataloader
    from adam_dehaze_tpu.resolution_autotune import tune_resolution_policy
    from adam_dehaze_tpu.serving import AdaptiveDehazer

    dehazer = AdaptiveDehazer.from_experiment(
        args.experiment, autotune=not args.no_autotune)
    config = dehazer.config

    hazy, clear, levels = [], [], []
    for batch in get_dataloader(config, args.split, shard_per_host=False):
        m = np.asarray(batch["mask"])
        hazy.append(np.asarray(batch["hazy"])[m])
        clear.append(np.asarray(batch["clear"])[m])
        levels.append(np.asarray(batch["intensity"])[m])
    hazy = np.concatenate(hazy)
    clear = np.concatenate(clear)
    levels = np.concatenate(levels)
    print(f"probe ({args.split}): {hazy.shape[0]} images")

    cache_path = os.path.join(args.experiment, "resolution_policy.json")
    policy = tune_resolution_policy(
        dehazer._branch_applies(), hazy, clear, levels,
        floor_db=args.floor_db, batch=args.batch, cache_path=cache_path)
    policy["experiment"] = args.experiment
    policy["probe_split"] = args.split
    with open(cache_path, "w") as f:
        json.dump(policy, f, indent=2, sort_keys=True)

    for lvl, entry in policy["levels"].items():
        print(f"{lvl}: {entry['choice']}  "
              f"(full {entry.get('psnr_full')} dB -> "
              f"{entry.get('psnr_choice', entry.get('psnr_full'))} dB)")
        for name, row in entry.get("table", {}).items():
            print(f"    {name}: {row}")

    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        shutil.copyfile(cache_path, args.out)
        print(f"wrote {cache_path} and {args.out}")


if __name__ == "__main__":
    main()
