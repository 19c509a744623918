#!/usr/bin/env python
"""Experiment: batch-binned hard routing vs soft (all-branches) routing.

Balanced class traffic (the dataset is balanced across low/medium/high), so
the binned engine runs each branch on one third of the batch instead of all
branches on the full batch. Not the official bench — results recorded in
PROGRESS notes.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 24
SIZE = 256


def main():
    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.models.branches import create_branch_models

    config = default_config()
    on_tpu = jax.default_backend() == "tpu"
    config["tpu"]["use_pallas"] = on_tpu
    config["tpu"]["compute_dtype"] = "bfloat16" if on_tpu else "float32"

    branches = create_branch_models(config)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    sub = x[:BATCH // 3]

    variables = {n: m.init(jax.random.PRNGKey(i),
                           jnp.zeros((1, SIZE, SIZE, 3)))
                 for i, (n, m) in enumerate(branches.items())}
    fns_full = {n: jax.jit(lambda img, m=m, v=variables[n]: m.apply(v, img))
                for n, m in branches.items()}
    fns_third = {n: jax.jit(lambda img, m=m, v=variables[n]: m.apply(v, img))
                 for n, m in branches.items()}

    def run_soft():
        outs = [fns_full[n](x) for n in ("low", "medium", "high")]
        return outs[0]

    def run_binned():
        outs = [fns_third[n](sub) for n in ("low", "medium", "high")]
        return outs[0]

    for label, fn, n_img in (("soft_all_branches", run_soft, BATCH),
                             ("binned_balanced", run_binned, BATCH)):
        for _ in range(3):
            out = fn()
        jax.block_until_ready(out)
        start = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        ms = (time.perf_counter() - start) / (iters * n_img) * 1000
        print(json.dumps({"mode": label, "ms_per_image": round(ms, 4)}))


if __name__ == "__main__":
    main()
