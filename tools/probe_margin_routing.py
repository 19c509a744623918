#!/usr/bin/env python
"""Margin-aware up-routing probe (VERDICT r3 item 1, quality side).

Policy: when the classifier's logit gap between the predicted class and the
next-STRONGER class is below tau, serve the stronger branch. Rationale from
the r3 artifacts: classifier errors are adjacent-class with small margins,
and under-routing (serving heavy fog with a weaker branch) is the costly
direction (fixed_low on all traffic: 22.0 dB vs 30.2 oracle), while a truly
near-boundary image sits between two regimes and tolerates the stronger
branch. tau=0 is plain argmax; large tau degenerates to always-up (which
the fixed-branch rows prove is bad), so tau must be CALIBRATED — this tool
sweeps tau on the val split, picks the best val PSNR, and reports the
held-out test quality + effective routing accuracy at that tau.

Run on TPU after training (phase-B queue); one compile per branch at the
full-split batch shape.

Usage: python tools/probe_margin_routing.py [--experiment DIR] [--out JSON]
"""
import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TAUS = (0.0, 0.25, 0.5, 1.0, 2.0, 4.0)


def margin_up_route(logits: np.ndarray, tau: float) -> np.ndarray:
    """argmax, bumped to the next stronger class where the logit gap toward
    it is below tau."""
    pred = logits.argmax(axis=1)
    k = logits.shape[1]
    out = pred.copy()
    can_up = pred < k - 1
    gap = logits[np.arange(len(pred)), pred] - \
        logits[np.arange(len(pred)), np.minimum(pred + 1, k - 1)]
    out[can_up & (gap < tau)] += 1
    return out


def _split_arrays(config, split):
    from adam_dehaze_tpu.data.dataset import get_dataloader
    hazy, clear, level = [], [], []
    for batch in get_dataloader(config, split, shard_per_host=False):
        m = batch["mask"]
        hazy.append(np.asarray(batch["hazy"])[m])
        clear.append(np.asarray(batch["clear"])[m])
        level.append(np.asarray(batch["intensity"])[m])
    return (np.concatenate(hazy), np.concatenate(clear),
            np.concatenate(level))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiment", default="experiments/full_system_r3")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from adam_dehaze_tpu.config import load_config, update_checkpoint_paths
    from adam_dehaze_tpu.evaluation.evaluate import _load_joint
    from adam_dehaze_tpu.ops.image import psnr

    config = update_checkpoint_paths(
        load_config(os.path.join(args.experiment, "config.yaml")),
        args.experiment)
    router, state = _load_joint(config)
    clf_sub = {"params": state.params["classifier"],
               "batch_stats": state.batch_stats["classifier"]}
    fwd_logits = jax.jit(lambda im: router.classifier.apply(clf_sub, im)[0])
    branch_fns = []
    for lvl in ("low", "medium", "high"):
        sub = {"params": state.params[f"models_{lvl}"],
               "batch_stats": state.batch_stats[f"models_{lvl}"]}
        branch_fns.append(jax.jit(
            lambda im, m=router.models[lvl], v=sub: m.apply(v, im)))

    report = {"taus": list(TAUS), "splits": {}}
    chosen_tau = None
    for split in ("val", "test"):
        hazy, clear, level = _split_arrays(config, split)
        x = jnp.asarray(hazy)
        logits = np.asarray(fwd_logits(x))
        # Serve per-branch over the whole split once; select per policy.
        outs = [np.asarray(f(x)) for f in branch_fns]
        rows = {}
        taus = TAUS if split == "val" else (0.0, chosen_tau)
        for tau in taus:
            labels = margin_up_route(logits, tau)
            served = np.stack([outs[l][i] for i, l in enumerate(labels)])
            ps = float(np.mean(np.asarray(
                psnr(jnp.asarray(served), jnp.asarray(clear)))))
            acc = float((labels == level).mean())
            up_frac = float((labels != logits.argmax(axis=1)).mean())
            rows[str(tau)] = {"psnr": round(ps, 4), "routing_acc": round(acc, 4),
                              "up_frac": round(up_frac, 4)}
            print(f"[{split}] tau={tau}: psnr={ps:.3f} acc={acc:.4f} "
                  f"up={up_frac * 100:.1f}%")
        report["splits"][split] = rows
        if split == "val":
            chosen_tau = float(max(TAUS, key=lambda t: rows[str(t)]["psnr"]))
            report["chosen_tau"] = chosen_tau
            print(f"chosen tau (best val PSNR): {chosen_tau}")

    base = report["splits"]["test"]["0.0"]
    best = report["splits"]["test"][str(chosen_tau)]
    report["test_delta_psnr"] = round(best["psnr"] - base["psnr"], 4)
    report["test_delta_acc"] = round(
        best["routing_acc"] - base["routing_acc"], 4)
    out = args.out or os.path.join(args.experiment, "margin_routing.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}: test dPSNR {report['test_delta_psnr']:+.3f} dB, "
          f"dacc {report['test_delta_acc']:+.4f}")


if __name__ == "__main__":
    main()
