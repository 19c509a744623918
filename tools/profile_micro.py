#!/usr/bin/env python
"""Microbenchmarks locating the TPU bandwidth/layout cliffs found by
tools/profile_branches.py: conv channel-width sweep at 256², the
AttentionBlock decomposed into its passes, and raw reduction/elementwise
bandwidth at the hot shapes.

Usage: python tools/profile_micro.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N, S = 16, 256


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def timeit(fn, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def row(label, ms, gflops=0.0, gbytes=0.0):
    tf = gflops / ms if ms else 0.0
    bw = gbytes / (ms / 1e3) if ms else 0.0
    print(f"{label:44s} {ms:8.3f} ms  {tf:7.1f} TF/s  {bw:7.0f} GB/s")
    return {"label": label, "ms": round(ms, 3),
            "tflops_per_s": round(tf, 1), "gbytes_per_s": round(bw, 0)}


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    rows = []

    # ---- conv3x3 channel sweep @ 256², batch 16, bf16 -------------------
    for c in (16, 32, 64, 96, 128, 192, 256):
        x = jax.random.uniform(key, (N, S, S, c), jnp.float32).astype(dt)
        w = jax.random.normal(key, (3, 3, c, c), jnp.float32).astype(dt) * 0.05
        f = jax.jit(lambda a, k: jax.lax.conv_general_dilated(
            a, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        ms = timeit(f, x, w) * 1e3
        gf = 2 * 9 * c * c * S * S * N / 1e9
        gb = 2 * (2 * N * S * S * c) / 1e9  # read + write bf16
        rows.append(row(f"conv3x3 c={c} @256²", ms, gf, gb))

    # ---- the same c=32 conv with 2x2 space-to-depth packing -------------
    c = 32
    x = jax.random.uniform(key, (N, S // 2, S // 2, 4 * c),
                           jnp.float32).astype(dt)
    w = jax.random.normal(key, (2, 2, 4 * c, 4 * c), jnp.float32).astype(dt) * 0.05
    f = jax.jit(lambda a, k: jax.lax.conv_general_dilated(
        a, k, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    ms = timeit(f, x, w) * 1e3
    gf = 2 * 4 * (4 * c) ** 2 * (S // 2) ** 2 * N / 1e9
    gb = 2 * (2 * N * S * S * c) / 1e9
    rows.append(row("conv2x2 c=128 @128² (s2d-equiv of c=32)", ms, gf, gb))

    # ---- attention decomposition @ 256², c=96 ----------------------------
    c = 96
    x = jax.random.uniform(key, (N, S, S, c), jnp.float32).astype(dt)
    gb1 = 2 * N * S * S * c / 1e9  # one bf16 read of x

    f = jax.jit(lambda a: (jnp.mean(a, axis=(1, 2)), jnp.max(a, axis=(1, 2))))
    rows.append(row("chan mean+max @256²x96", timeit(f, x) * 1e3, 0, gb1))

    g = jax.random.uniform(key, (N, c), jnp.float32).astype(dt)
    f = jax.jit(lambda a, gg: a * gg[:, None, None, :])
    rows.append(row("chan-gate multiply @256²x96", timeit(f, x, g) * 1e3,
                    0, 3 * gb1))

    f = jax.jit(lambda a: (jnp.mean(a, axis=-1), jnp.max(a, axis=-1)))
    rows.append(row("spatial mean+max @256²x96", timeit(f, x) * 1e3, 0, gb1))

    from adam_dehaze_tpu.ops.pallas.cbam import spatial_gate
    w7 = jax.random.normal(key, (7, 7, 2, 1), jnp.float32).astype(dt) * 0.05
    f = jax.jit(lambda a, k: spatial_gate(a, k))
    rows.append(row("pallas spatial_gate @256²x96", timeit(f, x, w7) * 1e3,
                    0, 2 * gb1))

    # XLA (non-pallas) spatial gate for comparison
    def xla_gate(a, k):
        stats = jnp.stack([jnp.mean(a, axis=-1), jnp.max(a, axis=-1)], axis=-1)
        gate = jax.lax.conv_general_dilated(
            stats, k, (1, 1), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return a * jax.nn.sigmoid(gate)
    f = jax.jit(xla_gate)
    rows.append(row("xla spatial_gate @256²x96", timeit(f, x, w7) * 1e3,
                    0, 2 * gb1))

    # ---- raw elementwise bandwidth reference -----------------------------
    f = jax.jit(lambda a: a * 1.0001 + 0.5)
    rows.append(row("elementwise a*b+c @256²x96", timeit(f, x) * 1e3, 0, 2 * gb1))

    # ---- classifier stem-alike: conv7x7 s2 3->64 @256² -------------------
    x3 = jax.random.uniform(key, (48, S, S, 3), jnp.float32)
    w7s = jax.random.normal(key, (7, 7, 3, 64), jnp.float32) * 0.05
    f = jax.jit(lambda a, k: jax.lax.conv_general_dilated(
        a.astype(dt), k.astype(dt), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    ms = timeit(f, x3, w7s) * 1e3
    gf = 2 * 49 * 3 * 64 * (S // 2) ** 2 * 48 / 1e9
    rows.append(row("conv7x7s2 3->64 @256² b48 (clf stem)", ms, gf, 0))

    out_path = "benchmarks/profile_micro.json"
    os.makedirs("benchmarks", exist_ok=True)
    with open(out_path, "w") as f2:
        json.dump({"batch": N, "size": S, "rows": rows}, f2, indent=2)
    print(f"\nWrote {out_path}")


if __name__ == "__main__":
    main()
