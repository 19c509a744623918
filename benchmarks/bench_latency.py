#!/usr/bin/env python
"""Single-image serving latency via the lax.switch path (BASELINE north
star: full adaptive pipeline < 5 ms/image on one v5e chip).

One image -> classifier -> lax.switch into exactly one branch. Reports
average latency over a stream of single-image requests (dispatch pipelined)
and worst-case (per-call block)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = 256


def main():
    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.models.routing import make_adaptive_infer

    config = default_config()
    on_tpu = jax.default_backend() == "tpu"
    config["tpu"]["use_pallas"] = on_tpu
    config["tpu"]["compute_dtype"] = "bfloat16" if on_tpu else "float32"

    classifier = create_classifier(config)
    branches = create_branch_models(config)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    clf_vars = classifier.init({"params": key, "dropout": key}, dummy)
    branch_vars = {n: m.init(jax.random.PRNGKey(i), dummy)
                   for i, (n, m) in enumerate(branches.items())}

    clf_apply = lambda x: classifier.apply(clf_vars, x)
    applies = [
        (lambda v, m: (lambda img: m.apply(v, img)))(branch_vars[n], branches[n])
        for n in ("low", "medium", "high")
    ]
    infer = jax.jit(make_adaptive_infer(clf_apply, applies, "switch"))

    x = jax.random.uniform(key, (1, SIZE, SIZE, 3), jnp.float32)
    for _ in range(5):
        out, _ = infer(x)
    jax.block_until_ready(out)

    # Streamed: dispatch pipelined across requests.
    iters = 50
    start = time.perf_counter()
    for _ in range(iters):
        out, _ = infer(x)
    jax.block_until_ready(out)
    streamed_ms = (time.perf_counter() - start) / iters * 1000

    # Blocking: host waits for each image (worst-case interactive latency).
    start = time.perf_counter()
    for _ in range(iters):
        out, _ = infer(x)
        jax.block_until_ready(out)
    blocking_ms = (time.perf_counter() - start) / iters * 1000

    print(json.dumps({
        "metric": "single_image_switch_latency_256",
        "streamed_ms": round(streamed_ms, 3),
        "blocking_ms": round(blocking_ms, 3),
        "target_ms": 5.0,
    }))


if __name__ == "__main__":
    main()
