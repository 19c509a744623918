#!/usr/bin/env python
"""Headline benchmark: adaptive dehazing end-to-end latency per image.

Runs the flagship pipeline (fog classifier -> soft router -> 3 branch experts
-> fused blend) on the real TPU chip at the reference's working resolution
(256x256, reference: config/config.yaml:7) in bfloat16, and reports
milliseconds per image end-to-end.

Baseline: the reference reports 30 ms/image average adaptive inference on its
GPU (README.md:149; BASELINE.md "Adaptive average inference"). vs_baseline is
the speedup factor (baseline_ms / ours_ms) — higher is better.

Prints exactly ONE JSON line.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the pipeline graph takes minutes to compile
# through the remote-compile path; cached runs start in seconds.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_MS_PER_IMAGE = 30.0
BATCH = 16
SIZE = 256
WARMUP = 5
ITERS = 30


def main():
    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.models.routing import create_router

    config = default_config()
    on_tpu = jax.default_backend() == "tpu"
    config["tpu"]["use_pallas"] = on_tpu
    config["tpu"]["compute_dtype"] = "bfloat16" if on_tpu else "float32"

    classifier = create_classifier(config)
    branches = create_branch_models(config)
    router = create_router(branches, classifier, config)

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    variables = router.init({"params": key, "dropout": key},
                            jnp.zeros((1, SIZE, SIZE, 3), jnp.float32))

    @jax.jit
    def infer(images):
        dehazed, _ = router.apply(variables, images, train=False)
        return dehazed

    for _ in range(WARMUP):
        out = infer(x)
    jax.block_until_ready(out)

    start = time.perf_counter()
    for _ in range(ITERS):
        out = infer(x)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    ms_per_image = elapsed / (ITERS * BATCH) * 1000.0
    print(json.dumps({
        "metric": "adaptive_dehaze_ms_per_image_256",
        "value": round(ms_per_image, 4),
        "unit": "ms/image",
        "vs_baseline": round(BASELINE_MS_PER_IMAGE / ms_per_image, 2),
    }))


if __name__ == "__main__":
    main()
