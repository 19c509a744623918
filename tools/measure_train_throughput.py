#!/usr/bin/env python
"""Measure full-system joint-training throughput on the attached chip.

Builds the complete joint step (classifier + soft router + three branches +
VGG/LPIPS joint loss + backward + Adam) exactly like training/train_joint.py
and times steady-state steps with the reliable axon sync (scalar fetch).

Usage: python tools/measure_train_throughput.py [--batch 16] [--size 256]
                                                [--steps 20]
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


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke tests)")
    p.add_argument("--mode", default="soft", choices=("soft", "hard"),
                   help="soft: the reference-faithful 3x-branch joint step; "
                        "hard: the hard_finetune_frac per-branch steps "
                        "(one pure-class batch per branch per round) — the "
                        "compute-bound side of the r4 A/B")
    p.add_argument("--remat", default="none",
                   choices=("none", "full", "fullres"),
                   help="rematerialisation: none | full (checkpoint the "
                        "whole forward) | fullres (selective — recompute "
                        "only full-resolution activations; the batch-32 "
                        "HBM fit, ROUND3.md)")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.losses.dehazing import get_joint_loss
    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.models.routing import create_router
    from adam_dehaze_tpu.training.state import TrainState, make_optimizer
    from adam_dehaze_tpu.training.train_joint import make_train_step

    on_tpu = jax.default_backend() == "tpu"
    config = default_config()
    config["tpu"]["use_pallas"] = on_tpu
    config["tpu"]["compute_dtype"] = "bfloat16" if on_tpu else "float32"
    config["dataset"]["img_size"] = args.size
    config["dataset"]["batch_size"] = args.batch
    # fullres remat is structural: the branch models themselves must be
    # built with the flag (models/branches.py:_common_kwargs).
    config["tpu"]["remat"] = {"none": False, "full": True,
                              "fullres": "fullres"}[args.remat]

    classifier = create_classifier(config)
    branches = create_branch_models(config)
    router = create_router(branches, classifier, config)
    joint_loss = get_joint_loss(config)
    loss_params = joint_loss.init(jax.random.PRNGKey(1),
                                  (1, args.size, args.size, 3))
    tx = make_optimizer(config["joint_training"]["learning_rate"])

    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, args.size, args.size, 3), jnp.float32)
    variables = router.init({"params": key, "dropout": key}, x0)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    remat = {"none": False, "full": True, "fullres": "fullres"}[args.remat]
    step = make_train_step(router, tx, joint_loss, loss_params,
                           augmentation=True, remat=remat,
                           img_size=args.size)

    n, s = args.batch, args.size
    batch = {
        "hazy": jax.random.uniform(jax.random.PRNGKey(1), (n, s, s, 3)),
        "clear": jax.random.uniform(jax.random.PRNGKey(2), (n, s, s, 3)),
        "dehazed": jax.random.uniform(jax.random.PRNGKey(3), (n, s, s, 3)),
        "intensity": jnp.zeros((n,), jnp.int32),
    }

    def sync(st):
        return float(jnp.sum(jax.tree_util.tree_leaves(st.params)[0]))

    if args.mode == "hard":
        from adam_dehaze_tpu.training.train_joint import (
            make_hard_branch_step,
        )
        levels = ("low", "medium", "high")
        states = {lvl: TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"][f"models_{lvl}"],
            batch_stats=variables["batch_stats"][f"models_{lvl}"],
            opt_state=tx.init(variables["params"][f"models_{lvl}"]))
            for lvl in levels}
        steps_h = {}
        for lvl in levels:
            s_fn = make_hard_branch_step(router.models[lvl], tx, joint_loss,
                                         loss_params, augmentation=True)
            steps_h[lvl] = s_fn.lower(states[lvl], batch,
                                      key).compile()
        for i in range(3):
            for lvl in levels:
                states[lvl], _ = steps_h[lvl](states[lvl], batch,
                                              jax.random.PRNGKey(10 + i))
        sync(states["high"])
        t0 = time.perf_counter()
        for i in range(args.steps):
            for lvl in levels:
                states[lvl], _ = steps_h[lvl](states[lvl], batch,
                                              jax.random.PRNGKey(100 + i))
        sync(states["high"])
        dt = (time.perf_counter() - t0) / args.steps  # per 3-batch round
        line = {
            "metric": "joint_train_hard_imgs_per_sec_per_chip",
            "value": round(3 * args.batch / dt, 1),
            "sec_per_round": round(dt, 4),
            "batch": args.batch, "size": args.size,
            "device": jax.devices()[0].device_kind,
        }
        try:
            flops = 0.0
            for lvl in levels:
                cost = steps_h[lvl].cost_analysis()
                if isinstance(cost, list):
                    cost = cost[0]
                flops += float(cost.get("flops", 0.0))
            if flops > 0:
                line["gflops_per_image"] = round(flops / (3 * args.batch)
                                                 / 1e9, 1)
                line["tflops_per_sec"] = round(flops / dt / 1e12, 1)
        except Exception:
            pass
        print(json.dumps(line))
        return

    # AOT-compile ONCE and execute that same executable: a second jit-path
    # compile would cost another ~15 min terminal-side on axon, and this
    # also gives us cost_analysis() (exact fwd+bwd+loss+Adam FLOPs) for an
    # honest train-MFU figure without any extra compile.
    compiled = step.lower(state, batch, key).compile()

    for i in range(3):
        state, metrics = compiled(state, batch, jax.random.PRNGKey(10 + i))
    sync(state)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = compiled(state, batch, jax.random.PRNGKey(100 + i))
    sync(state)
    dt = (time.perf_counter() - t0) / args.steps

    line = {
        "metric": "joint_train_imgs_per_sec_per_chip",
        "value": round(args.batch / dt, 1),
        "sec_per_step": round(dt, 4),
        "batch": args.batch, "size": args.size,
        "remat": args.remat,
        "device": jax.devices()[0].device_kind,
    }
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            from bench import _peak_tflops  # repo-root bench helpers
            peak = _peak_tflops()
            line["train_gflops_per_step"] = round(flops / 1e9, 1)
            line["train_mfu_pct"] = round(flops / dt / (peak * 1e12) * 100, 1)
            line["assumed_peak_tflops"] = peak
    except Exception as e:  # cost analysis is best-effort on axon
        line["cost_analysis_error"] = str(e)[:120]
    print(json.dumps(line))


if __name__ == "__main__":
    main()
