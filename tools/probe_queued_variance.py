"""Idle-host variance probe for the queued continuous-batching row.

VERDICT r4 item 4: `queued_routing_trained_ms_per_image` swung 3.3x between
the driver run (2.094) and the builder run (6.864). The suspect was host
contention (phase-B training shared the 1-core host). This probe isolates
the engine: parity models (random weights — branch cost depends only on
shapes), the SAME traffic shape as bench's trained row (three ~pure-class
batches of `bucket`, composed through `BinnedAdaptiveEngine.run_queued`,
reference routing semantics: /root/reference/models/routing.py:45-62), run
3x on an idle host, reporting min/median/max and relative spread.

Pass criterion: spread (max-min)/min < 10% — the row is then a stable
capability number, and any future swing is a contention artifact, not
engine nondeterminism.

Usage: python tools/probe_queued_variance.py  (real TPU, idle host)
Writes benchmarks/round_results/queued_variance_r5.json.
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

import bench  # reuse _time/_sync, sizes, and the tracked-artifact resolver


def main():
    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.models.routing import BinnedAdaptiveEngine
    from adam_dehaze_tpu.ops.s2d import (
        make_classifier_serving_apply,
        make_serving_apply,
    )

    config = default_config()
    on_tpu = jax.default_backend() == "tpu"
    config["tpu"]["use_pallas"] = on_tpu
    config["tpu"]["compute_dtype"] = "bfloat16" if on_tpu else "float32"
    serving_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    classifier = create_classifier(config)
    branches = create_branch_models(config)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, bench.SIZE, bench.SIZE, 3), jnp.float32)
    clf_vars = classifier.init({"params": key, "dropout": key}, dummy)
    branch_vars = {n: m.init(jax.random.PRNGKey(i), dummy)
                   for i, (n, m) in enumerate(branches.items())}

    clf_serving = make_classifier_serving_apply(classifier, clf_vars,
                                                dtype=serving_dtype)
    serving_applies = [
        make_serving_apply(branches[n], branch_vars[n], dtype=serving_dtype)
        for n in ("low", "medium", "high")
    ]
    # Same autotuned dispatch bench uses (cache hits only, idle-host table).
    from adam_dehaze_tpu.serving_autotune import load_cached
    cache_path = bench._tuned_artifact("BENCH_AUTOTUNE_CACHE",
                                       "serving_autotune.json",
                                       "serving_autotune.json")
    bucket = bench.BATCH // 3
    dispatch = {}
    for i, n in enumerate(("low", "medium", "high")):
        try:
            fn, hit = load_cached(branches[n], branch_vars[n], serving_dtype,
                                  (bucket, bench.SIZE, bench.SIZE, 3),
                                  cache_path)
        except Exception as e:
            print(f"autotune lookup failed for {n}: {e}", file=sys.stderr)
            continue
        if fn is not None:
            serving_applies[i] = fn
            dispatch[n] = hit["best"]

    engine = BinnedAdaptiveEngine(jax.jit(clf_serving),
                                  [jax.jit(f) for f in serving_applies],
                                  buckets=(2, 4, bucket))

    # bench's trained-traffic shape: BATCH images arriving as three
    # ~pure-class batches of `bucket` — the class-clumped case run_queued
    # exists for (full same-class buckets, zero pad waste).
    x = jax.random.uniform(key, (bench.BATCH, bench.SIZE, bench.SIZE, 3),
                           jnp.float32)
    labels = np.repeat(np.arange(3), bucket)
    qbatches = [x[i:i + bucket] for i in range(0, bench.BATCH, bucket)]
    qlabels = [labels[i:i + bucket] for i in range(0, bench.BATCH, bucket)]

    # Two sync styles, to separate engine cost from measurement artifact:
    #
    # - "last": bench's r4 methodology — keep only the final yielded bucket
    #   and let _time's scalar fetch force it. Whether that forces the
    #   EARLIER buckets too depends on the runtime executing enqueued
    #   programs FIFO; if it doesn't, work spills past the timer and the
    #   next rep pays the backlog (the suspected source of the r4
    #   2.09<->6.86 swing — it reproduced on an idle host: 1.95 then 5.9).
    # - "full": fold every yielded bucket into one device-side scalar
    #   (enqueue-only, no host fetch inside the loop); syncing that scalar
    #   provably forces the whole call's work inside the timed window.
    #
    # Each rep additionally times a post-loop DRAIN: fetching the stashed
    # per-call scalars from the timed loop's earlier calls. drain >> 0
    # proves under-measurement (in-flight work crossed the timer line).
    iters = max(bench.ITERS // 3, 5)

    def _measure(style, reps_n):
        rows = []
        for r in range(reps_n):
            accs = []

            def _run_q():
                acc = None
                last = None
                for out, _g, _c in engine.run_queued(
                        qbatches, queue_bucket=bucket, intensities=qlabels):
                    if style == "full":
                        s = jnp.sum(out)
                        acc = s if acc is None else acc + s
                    last = out
                ret = acc if style == "full" else jnp.asarray(last)
                accs.append(ret)
                return ret

            per_iter = bench._time(_run_q, iters=iters)
            t0 = time.perf_counter()
            for a in accs:  # force everything the timed loop enqueued
                float(jnp.sum(a))
            drain_s = time.perf_counter() - t0
            ms = per_iter / bench.BATCH * 1000.0
            drain_ms = drain_s / iters / bench.BATCH * 1000.0
            rows.append({"loop_ms_per_image": round(ms, 4),
                         "drain_ms_per_image": round(drain_ms, 4),
                         "total_ms_per_image": round(ms + drain_ms, 4)})
            print(f"{style} rep {r}: loop {ms:.4f} + drain {drain_ms:.4f} "
                  f"ms/image", file=sys.stderr)
        return rows

    full_rows = _measure("full", 6)
    last_rows = _measure("last", 6)

    totals = [r["total_ms_per_image"] for r in full_rows]
    spread = (max(totals) - min(totals)) / min(totals)
    result = {
        "metric": "queued_routing_ms_per_image_256",
        "traffic": "class_clumped_3x%d_parity_models" % bucket,
        "full_sync_reps": full_rows,
        "last_sync_reps": last_rows,
        "min": round(min(totals), 4),
        "median": round(float(np.median(totals)), 4),
        "max": round(max(totals), 4),
        "rel_spread_pct": round(spread * 100.0, 2),
        "stable_lt_10pct": bool(spread < 0.10),
        "autotuned_dispatch": dispatch,
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
    }
    out_path = os.path.join("benchmarks", "round_results",
                            "queued_variance_r5.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
