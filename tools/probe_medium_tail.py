#!/usr/bin/env python
"""Fair-dtype serving ladder for the MEDIUM branch with the fused tail.

Round-3 context (logs/probe_medium_fair.log): canonical 23.45 ms <
s2d 25.73 @256²x16 bf16 — the XLA s2d tail's ~7 separate full-res
programs lose to XLA's fused canonical tail. The fused Pallas tail chain
(ops/pallas/tail_chain.py:make_medium_tail_chain) replaces exactly those
ops with ONE VMEM-resident program per image; this probe decides the
medium dispatch in make_serving_apply:

  canonical | s2d (XLA tail) | s2d + tail_chain (strip sweep)

plus the isolated tail A/B (XLA tail program vs fused kernel, same
dispatch floor both sides). All contenders at the serving dtype.
Prints one JSON line.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

BATCH = int(os.environ.get("PROBE_BATCH", 16))
SIZE = int(os.environ.get("PROBE_SIZE", 256))
WARM = int(os.environ.get("PROBE_WARM", 3))
ITERS = int(os.environ.get("PROBE_ITERS", 10))

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")


def _fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(sum(jnp.sum(l) for l in leaves))


def _time(fn, *args):
    out = None
    for _ in range(WARM):
        out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / ITERS * 1000.0


def main():
    from adam_dehaze_tpu.models.branches import MediumIntensityDehazeModel
    from adam_dehaze_tpu.ops.s2d import (
        depth_to_space,
        make_medium_s2d_apply,
        space_to_depth,
    )
    from adam_dehaze_tpu.ops.pallas.tail_chain import make_medium_tail_chain

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.float32)

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    model = MediumIntensityDehazeModel(use_pallas=on_tpu, dtype=dt)
    variables = model.init(jax.random.PRNGKey(1), x[:1], train=False)
    c = model.base_channels

    results = {}

    # --- canonical (current dispatch, ops/s2d.py:make_serving_apply) ---
    canon = jax.jit(lambda v, xi: model.apply(v, xi, train=False))
    results["canonical_ms"] = _time(lambda xi: canon(variables, xi), x)

    # --- s2d path, XLA tail ---
    s2d_fn = jax.jit(make_medium_s2d_apply(model, variables, dtype=dt))
    results["s2d_ms"] = _time(s2d_fn, x)

    # --- s2d path + fused tail chain, strip sweep ---
    strips = [int(s) for s in
              os.environ.get("PROBE_STRIPS", "16,8").split(",")]
    best = None
    for strip in strips:
        try:
            tfn = make_medium_tail_chain(model, variables, dtype=dt,
                                         strip=strip, interpret=interp)
            h2 = SIZE // 2
            kd = jax.random.PRNGKey(2)
            d1_in = jax.nn.relu(
                jax.random.normal(kd, (BATCH, h2, h2, 4 * c), dt))
            f0s_in = jax.nn.relu(
                jax.random.normal(kd, (BATCH, h2, h2, 4 * c), dt))
            x2_in = space_to_depth(x).astype(dt)
            chain = jax.jit(
                lambda d, f, z, _f=tfn: depth_to_space(_f(d, f, z)))
            ms = _time(chain, d1_in, f0s_in, x2_in)
            results[f"tail_chain_s{strip}_ms"] = ms
            if best is None or ms < best[1]:
                best = (strip, ms)
        except Exception as e:
            print(f"medium tail chain strip={strip} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
    if best is not None:
        try:
            full_chain = jax.jit(make_medium_s2d_apply(
                model, variables, dtype=dt, tail_chain=True,
                interpret=interp))
            results["s2d_tail_chain_ms"] = _time(full_chain, x)
            err = float(jnp.max(jnp.abs(full_chain(x) - s2d_fn(x))))
            results["s2d_tail_chain_max_err"] = err
        except Exception as e:
            print(f"full medium tail-chain apply failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)

    results = {k: round(v, 3) if isinstance(v, float) else v
               for k, v in results.items()}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
