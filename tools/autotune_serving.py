#!/usr/bin/env python
"""Run the deployment-time serving autotuner on the attached chip.

Per branch, times every equivalence-tested serving path at the serving
dtype (fair-dtype rule) and caches the winner in the experiment's
serving_autotune.json — the file AdaptiveDehazer.from_experiment(...,
autotune=True) consumes. Prints one JSON line with the per-branch tables.

Usage: python tools/autotune_serving.py [--experiment experiments/full_system_r3]
           [--batch 16] [--size 256] [--iters 5] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiment", default="experiments/full_system_r3")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from adam_dehaze_tpu.serving_autotune import load_or_tune

    shape = (args.batch, args.size, args.size, 3)
    out = {"backend": jax.default_backend(), "shape": list(shape)}

    if os.path.isfile(os.path.join(args.experiment, "config.yaml")):
        from adam_dehaze_tpu.config import load_config, update_checkpoint_paths
        from adam_dehaze_tpu.evaluation.evaluate import _load_joint
        config = update_checkpoint_paths(
            load_config(os.path.join(args.experiment, "config.yaml")),
            args.experiment)
        router, state = _load_joint(config)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        cache = os.path.join(args.experiment, "serving_autotune.json")
        out["experiment"] = args.experiment
    else:
        # no trained experiment: random-init models at reference widths
        from adam_dehaze_tpu.config import default_config
        from adam_dehaze_tpu.models.branches import create_branch_models
        from adam_dehaze_tpu.models.classifier import create_classifier
        from adam_dehaze_tpu.models.routing import create_router
        config = default_config()
        router = create_router(create_branch_models(config),
                               create_classifier(config), config)
        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
        variables = router.init({"params": key, "dropout": key}, x0)
        cache = None
        out["experiment"] = None

    dtype = (jnp.bfloat16 if config.get("tpu", {}).get(
        "compute_dtype", "bfloat16") == "bfloat16" else jnp.float32)
    for level in ("low", "medium", "high"):
        sub = {"params": variables["params"][f"models_{level}"],
               "batch_stats": variables["batch_stats"][f"models_{level}"]}
        module = router.models[level]
        _, report = load_or_tune(module, sub, dtype=dtype,
                                 sample_shape=shape, cache_path=cache,
                                 iters=args.iters)
        out[level] = report
    print(json.dumps(out))


if __name__ == "__main__":
    main()
