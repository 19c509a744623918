#!/usr/bin/env python
"""Probe: fused Pallas s2d chain vs XLA s2d path for the low branch on TPU.

Prints timing + numerics for a 16-image bucket at 256x256 (the serving bucket
of the balanced batch-48 benchmark). Honest axon sync: scalar fetch.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

p = argparse.ArgumentParser()
p.add_argument("--iters", type=int, default=20)
p.add_argument("--batch", type=int, default=16)
p.add_argument("--strip", type=int, default=0)
p.add_argument("--lower-only", action="store_true",
               help="stop after jit.lower() — catches Mosaic lowering "
                    "errors without paying the remote XLA compile")
args = p.parse_args()

from adam_dehaze_tpu.models.branches import LightweightDehazeModel
from adam_dehaze_tpu.ops.pallas.s2d_chain import make_lightweight_chain_apply
from adam_dehaze_tpu.ops.s2d import make_lightweight_s2d_apply


def _fetch(out):
    return float(jnp.sum(out))


def timeit(fn, x, iters):
    out = fn(x)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    _fetch(out)
    return (time.perf_counter() - t0) / iters * 1000.0


m = LightweightDehazeModel(base_channels=32, n_blocks=3, dtype=jnp.bfloat16)
x1 = jnp.zeros((1, 256, 256, 3), jnp.float32)
v = m.init(jax.random.PRNGKey(0), x1)
x = jax.random.uniform(jax.random.PRNGKey(1), (args.batch, 256, 256, 3),
                       jnp.float32)

kw = {}
if args.strip:
    kw["strip"] = args.strip
chain = jax.jit(make_lightweight_chain_apply(v, dtype=jnp.bfloat16, **kw))
s2d = jax.jit(make_lightweight_s2d_apply(v, dtype=jnp.bfloat16))

if args.lower_only:
    t0 = time.perf_counter()
    chain.lower(x)
    print(f"chain lower OK in {time.perf_counter() - t0:.1f}s", flush=True)
    raise SystemExit(0)

t0 = time.perf_counter()
out_c = chain(x)
print(f"chain compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
t0 = time.perf_counter()
out_s = s2d(x)
print(f"s2d   compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
diff = float(jnp.max(jnp.abs(out_c - out_s)))
print(f"max |chain - s2d| = {diff:.5f}")

ms_c = timeit(chain, x, args.iters)
ms_s = timeit(s2d, x, args.iters)
print(f"chain: {ms_c:.3f} ms/batch{args.batch}  ({ms_c/args.batch:.3f} ms/img)")
print(f"s2d  : {ms_s:.3f} ms/batch{args.batch}  ({ms_s/args.batch:.3f} ms/img)")
