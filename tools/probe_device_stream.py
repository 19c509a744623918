#!/usr/bin/env python
"""Isolate the device-binned program's round-3 slowdown.

r2's single on-device binned program measured 1.95 ms/img per-batch and
1.67 ms/img streamed (logs/stream_probe.log). r3's program (low chain +
s2d classifier stem + pad-ladder engine) measures 2.05 / 2.13 despite
individually-faster kernels. This probe times TWO builds of
make_device_binned_infer at batch 48:

  A. r3 applies (make_serving_apply + s2d-stem classifier) — current bench
  B. r2-style applies (XLA s2d low, s2d medium, s2d high, canonical clf)

per-batch latency AND depth-3 stream for each — separating "the applies
changed" from "the engine/stream machinery changed".
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

BATCH = 48
SIZE = 256
WARM = 3
ITERS = 10


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def main():
    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.models.routing import make_device_binned_infer
    from adam_dehaze_tpu.ops.s2d import (
        make_classifier_serving_apply,
        make_high_s2d_apply,
        make_lightweight_s2d_apply,
        make_medium_s2d_apply,
        make_serving_apply,
    )

    config = default_config()
    config["tpu"]["use_pallas"] = True
    config["tpu"]["compute_dtype"] = "bfloat16"
    classifier = create_classifier(config)
    branches = create_branch_models(config)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    clf_vars = classifier.init({"params": key, "dropout": key}, dummy)
    bvars = {n: m.init(jax.random.PRNGKey(i), dummy)
             for i, (n, m) in enumerate(branches.items())}

    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    labels = jnp.asarray(np.repeat(np.arange(3), BATCH // 3))
    results = {}

    variants = {
        "r3": dict(
            clf=make_classifier_serving_apply(classifier, clf_vars),
            applies=[make_serving_apply(branches[n], bvars[n])
                     for n in ("low", "medium", "high")]),
        "r2style": dict(
            clf=lambda im: classifier.apply(clf_vars, im),
            applies=[
                make_lightweight_s2d_apply(bvars["low"]),
                make_medium_s2d_apply(branches["medium"], bvars["medium"]),
                make_high_s2d_apply(branches["high"], bvars["high"]),
            ]),
    }
    for tag, v in variants.items():
        try:
            fn = jax.jit(make_device_binned_infer(
                v["clf"], v["applies"], chunk=BATCH // 3))
            out = None
            for _ in range(WARM):
                out = fn(x, labels)
            _sync(out[0])
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(x, labels)
            _sync(out[0])
            ms = (time.perf_counter() - t0) / ITERS / BATCH * 1000.0
            results[f"{tag}_batch_ms_per_img"] = round(ms, 4)
            print(json.dumps({f"{tag}_batch_ms_per_img": results[
                f"{tag}_batch_ms_per_img"]}), flush=True)

            # depth-3 stream
            def stream(n_batches):
                pending = []
                for _ in range(n_batches):
                    pending.append(fn(x, labels))
                    if len(pending) >= 3:
                        o, inten, _ = pending.pop(0)
                        np.asarray(inten)
                last = None
                for o, inten, _ in pending:
                    np.asarray(inten)
                    last = o
                _sync(last)
            stream(3)
            t0 = time.perf_counter()
            stream(12)
            ms = (time.perf_counter() - t0) / 12 / BATCH * 1000.0
            results[f"{tag}_stream_ms_per_img"] = round(ms, 4)
            print(json.dumps({f"{tag}_stream_ms_per_img": results[
                f"{tag}_stream_ms_per_img"]}), flush=True)
        except Exception as e:
            print(f"{tag} failed: {type(e).__name__}: {e}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
