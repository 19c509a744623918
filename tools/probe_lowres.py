#!/usr/bin/env python
"""Measure the resolution-scheduling quality/latency dial on the trained
system (ops/resolution.py: branch served at half resolution, correction
lifted by a guided-filter joint upsample).

Quality: every test image served through its ORACLE branch (isolates the
resolution effect from routing noise), overall + per-level PSNR/SSIM for
each candidate dispatch. Cost: isolated per-branch serve time at the
serving dtype and batch (fair-dtype rule, benchmarks/PROFILE.md), plus the
balanced-traffic engine cost for baseline and the default dial.

Run on an IDLE host (timing-hygiene rule, benchmarks/PROFILE.md).

Usage: python tools/probe_lowres.py [--experiment experiments/full_system_r3]
           [--out benchmarks/round_results/resolution_scheduling.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LEVELS = ("low", "medium", "high")


def _sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def time_fn(fn, x, iters=10):
    _sync(fn(x))
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn(x)
    _sync(last)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiment", default="experiments/full_system_r3")
    p.add_argument("--out",
                   default="benchmarks/round_results/resolution_scheduling.json")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--only", default="",
                   help="comma-separated dial names to evaluate (default: "
                        "all); e.g. --only full,policy_auto to score just "
                        "the tuned policy against baseline without "
                        "recompiling every sweep dial")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from adam_dehaze_tpu.data.dataset import get_dataloader
    from adam_dehaze_tpu.evaluation.metrics import ImageQualityMetrics
    from adam_dehaze_tpu.models.routing import BinnedAdaptiveEngine
    from adam_dehaze_tpu.ops.resolution import make_lowres_apply
    from adam_dehaze_tpu.serving import AdaptiveDehazer

    dehazer = AdaptiveDehazer.from_experiment(args.experiment, autotune=True)
    config = dehazer.config
    img = config["dataset"]["img_size"]
    base_applies = dehazer._branch_applies()
    clf_apply = dehazer._classifier_apply()

    # Candidate dials: (name, {level: (mode, radius, scale)}).
    candidates = [
        ("full", {}),
        ("high_guided_r4", {"high": ("guided", 4, 2)}),
        ("high_guided_r2", {"high": ("guided", 2, 2)}),
        ("high_guided_r8", {"high": ("guided", 8, 2)}),
        ("high_bilinear", {"high": ("bilinear", 4, 2)}),
        ("high_guided_s4", {"high": ("guided", 2, 4)}),
        ("medhigh_guided_r4", {"high": ("guided", 4, 2),
                               "medium": ("guided", 4, 2)}),
    ]

    # The TUNED quality-guarded policy (tools/autotune_resolution.py), when
    # the experiment has one: evaluated on TEST here (it was tuned on val),
    # so the policy's reported quality is held-out.
    from adam_dehaze_tpu.resolution_autotune import (
        load_policy,
        policy_to_lowres,
    )
    policy = load_policy(os.path.join(args.experiment,
                                      "resolution_policy.json"))
    if policy is not None:
        dial = {lvl: (p["mode"], p["radius"], p["scale"])
                for lvl, p in policy_to_lowres(policy).items()}
        if dial and not any(d == dial for _, d in candidates):
            candidates.append(("policy_auto", dial))

    if args.only:
        keep = {s.strip() for s in args.only.split(",") if s.strip()}
        missing = keep - {n for n, _ in candidates}
        if missing:
            raise SystemExit(f"--only: unknown dials {sorted(missing)}")
        candidates = [(n, d) for n, d in candidates if n in keep]

    def applies_for(dial):
        fns = []
        for lvl, fn in zip(LEVELS, base_applies):
            if lvl in dial:
                mode, radius, scale = dial[lvl]
                fn = make_lowres_apply(fn, scale=scale, mode=mode,
                                       radius=radius)
            fns.append(fn)
        return fns

    # ---- Materialize the test set (oracle labels). ----
    hazy_all, clear_all, level_all = [], [], []
    for batch in get_dataloader(config, "test", shard_per_host=False):
        m = np.asarray(batch["mask"])
        hazy_all.append(np.asarray(batch["hazy"])[m])
        clear_all.append(np.asarray(batch["clear"])[m])
        level_all.append(np.asarray(batch["intensity"])[m])
    hazy_all = np.concatenate(hazy_all)
    clear_all = np.concatenate(clear_all)
    level_all = np.concatenate(level_all)
    n = hazy_all.shape[0]
    print(f"test set: {n} images")

    result = {"experiment": args.experiment, "n_test": int(n),
              "backend": jax.default_backend(), "dials": {}}

    bsz = args.batch
    for name, dial in candidates:
        engine = BinnedAdaptiveEngine(clf_apply, applies_for(dial),
                                      buckets=(bsz,))
        acc = ImageQualityMetrics(image_shape=(1, img, img, 3))
        for i in range(0, n, bsz):
            idx = np.arange(i, min(i + bsz, n))
            pad = bsz - idx.size
            full = np.concatenate([idx, np.repeat(idx[-1:], pad)])
            out, _ = engine(jnp.asarray(hazy_all[full]),
                            intensity=jnp.asarray(level_all[full]))
            out = np.asarray(out)[:idx.size]
            for lvl_i, lvl in enumerate(LEVELS):
                sel = level_all[idx] == lvl_i
                if sel.any():
                    acc.add_batch(out[sel], clear_all[idx][sel], lvl)
            acc.add_batch(out, clear_all[idx], "overall")
        stats = acc.compute_averages()
        row = {k: {m: round(float(v), 4) for m, v in s.items()}
               for k, s in stats.items()}
        result["dials"][name] = row
        print(f"{name}: overall PSNR "
              f"{row['overall'].get('psnr', float('nan')):.2f} "
              f"high PSNR {row.get('high', {}).get('psnr', float('nan')):.2f}")

    # ---- Isolated branch costs at the serving batch (idle host). ----
    x16 = jnp.asarray(hazy_all[:bsz])
    costs = {}
    for lvl_i, lvl in enumerate(LEVELS):
        costs[f"{lvl}_full_ms"] = round(
            time_fn(jax.jit(base_applies[lvl_i]), x16), 3)
    for name, dial in candidates[1:]:
        fns = applies_for(dial)
        for lvl in dial:
            lvl_i = LEVELS.index(lvl)
            costs[f"{lvl}_{name}_ms"] = round(
                time_fn(jax.jit(fns[lvl_i]), x16), 3)
    result["isolated_branch_ms_per_batch"] = costs
    result["batch"] = bsz

    # ---- Balanced-traffic engine cost: baseline vs default dial. ----
    sel = np.concatenate([np.where(level_all == i)[0][:16] for i in range(3)])
    xb = jnp.asarray(hazy_all[sel])
    lb = jnp.asarray(level_all[sel])
    eng_cost = {}
    for name, dial in (candidates[0], candidates[1]):
        engine = BinnedAdaptiveEngine(clf_apply, applies_for(dial),
                                      buckets=(16,))
        def run(x, e=engine, l=lb):
            out, _ = e(x, intensity=l)
            return out
        eng_cost[name] = round(time_fn(run, xb) / 48, 4)
    result["balanced_engine_ms_per_image"] = eng_cost

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if args.only and os.path.exists(args.out):
        # partial run: merge into the existing artifact instead of dropping
        # the dial rows this run skipped.
        try:
            with open(args.out) as f:
                prev = json.load(f)
            for sect in ("dials", "isolated_branch_ms_per_batch",
                         "balanced_engine_ms_per_image"):
                merged = dict(prev.get(sect, {}))
                merged.update(result.get(sect, {}))
                result[sect] = merged
        except (OSError, ValueError):
            pass
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["balanced_engine_ms_per_image"]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
