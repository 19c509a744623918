#!/usr/bin/env python
"""Decompose the trained-routing cost gap (bench_line_r3i: fidelity 3.18,
spill 2.06, device-spill 2.03 vs oracle 1.56 ms/image).

At n=48, buckets=(16,), the capacity plan always redistributes to exactly
(16,16,16) — the oracle's program set — so the +0.5 ms/image on the spill
rows cannot be program count. Candidates this probe separates:

  A. label LAYOUT (contiguous oracle bins vs scattered trained bins):
     same programs, different gather/scatter index content.
  B. host spill planning (plan_capacity_spill numpy cost on the enqueue
     critical path).
  C. the device engine's IN-PROGRAM capacity plan (a fixed compute cost:
     compare spill=True vs False under identical balanced labels).
  D. measurement context (row ordering): every pair is timed interleaved
     A/B/A/B so tunnel drift cancels.

Run on an IDLE host. Uses bench's parity models + compiled-program reuse,
so the only compiles are the engine programs bench itself compiles.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH, SIZE = 48, 256


def _sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def time_interleaved(fns, iters=12, warm=3):
    """Time several zero-arg fns interleaved (A/B/A/B...) so slow drift in
    the tunnel/host affects every contender equally. Returns ms-per-call."""
    for fn in fns:
        out = None
        for _ in range(warm):
            out = fn()
        _sync(out)
    totals = [0.0] * len(fns)
    for _ in range(iters):
        for i, fn in enumerate(fns):
            t0 = time.perf_counter()
            _sync(fn())
            totals[i] += time.perf_counter() - t0
    return [t / iters * 1e3 for t in totals]


def main():
    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.models.routing import (
        BinnedAdaptiveEngine,
        make_device_binned_infer,
    )
    from adam_dehaze_tpu.ops.s2d import (
        make_classifier_serving_apply,
        make_serving_apply,
    )

    config = default_config()
    on_tpu = jax.default_backend() == "tpu"
    config["tpu"]["use_pallas"] = on_tpu
    config["tpu"]["compute_dtype"] = "bfloat16" if on_tpu else "float32"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    classifier = create_classifier(config)
    branches = create_branch_models(config)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    clf_vars = classifier.init({"params": key, "dropout": key}, dummy)
    branch_vars = {n: m.init(jax.random.PRNGKey(i), dummy)
                   for i, (n, m) in enumerate(branches.items())}
    clf_serving = make_classifier_serving_apply(classifier, clf_vars,
                                                dtype=dtype)
    applies = [make_serving_apply(branches[n], branch_vars[n], dtype=dtype)
               for n in ("low", "medium", "high")]
    # Adopt the autotuned dispatch like bench does (cache hits only).
    from adam_dehaze_tpu.serving_autotune import load_cached
    cache = "experiments/full_system_r3/serving_autotune.json"
    for i, n in enumerate(("low", "medium", "high")):
        fn, hit = load_cached(branches[n], branch_vars[n], dtype,
                              (16, SIZE, SIZE, 3), cache)
        if fn is not None:
            applies[i] = fn
            print(f"dispatch {n}: {hit['best']}")

    bucket = BATCH // 3
    engine = BinnedAdaptiveEngine(jax.jit(clf_serving),
                                  [jax.jit(f) for f in applies],
                                  buckets=(bucket,))
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.float32)

    balanced = np.repeat(np.arange(3), bucket)            # contiguous bins
    rng = np.random.default_rng(7)
    shuffled = balanced.copy()
    rng.shuffle(shuffled)                                  # scattered bins
    # trained-like labels: balanced shuffled with 5 misroutes (89.6% acc)
    trained_like = shuffled.copy()
    flip = rng.choice(BATCH, 5, replace=False)
    trained_like[flip] = (trained_like[flip] + 1) % 3

    res = {"backend": jax.default_backend(), "batch": BATCH}

    # --- A: label layout, same 3-program set ---
    ms = time_interleaved([
        lambda: engine(x, intensity=balanced)[0],
        lambda: engine(x, intensity=shuffled)[0],
        lambda: engine(x, intensity=trained_like, spill=True)[0],
        lambda: engine(x, intensity=trained_like)[0],  # fidelity: extra progs
    ])
    res["host_oracle_contig_ms_img"] = round(ms[0] / BATCH, 4)
    res["host_oracle_shuffled_ms_img"] = round(ms[1] / BATCH, 4)
    res["host_spill_trainedlike_ms_img"] = round(ms[2] / BATCH, 4)
    res["host_fidelity_trainedlike_ms_img"] = round(ms[3] / BATCH, 4)
    print(json.dumps(res, indent=2))

    # --- B: host planning cost off-device ---
    t0 = time.perf_counter()
    for _ in range(1000):
        engine.plan_capacity_spill(trained_like)
    res["plan_capacity_spill_us"] = round(
        (time.perf_counter() - t0) * 1e3, 2)

    # --- C: device engine, spill program vs plain, identical labels ---
    dev = jax.jit(make_device_binned_infer(clf_serving, applies,
                                           chunk=bucket))
    dev_sp = jax.jit(make_device_binned_infer(clf_serving, applies,
                                              chunk=bucket, spill=True))
    lab = jnp.asarray(balanced)
    lab_tr = jnp.asarray(trained_like)
    ms = time_interleaved([
        lambda: dev(x, lab)[0],
        lambda: dev_sp(x, lab)[0],
        lambda: dev_sp(x, lab_tr)[0],
        lambda: dev(x, lab_tr)[0],
    ])
    res["dev_plain_balanced_ms_img"] = round(ms[0] / BATCH, 4)
    res["dev_spill_balanced_ms_img"] = round(ms[1] / BATCH, 4)
    res["dev_spill_trainedlike_ms_img"] = round(ms[2] / BATCH, 4)
    res["dev_plain_trainedlike_ms_img"] = round(ms[3] / BATCH, 4)

    print(json.dumps(res, indent=2))
    out = "benchmarks/round_results/trained_gap_probe.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
