#!/usr/bin/env python
"""Time the fused res/CBAM chain serving paths on the real chip.

Compares, at 256²x16 bf16 (the serving bucket shape):
  - high branch: s2d path with canonical inner stages (round-2 default)
    vs s2d path with the three fused chain segments (ops/pallas/res_chain.py)
  - medium branch: canonical apply (round-3 default) vs chain-hybrid

Prints one JSON line per measurement; the winner decides
make_serving_apply's dispatch (the dispatch-follows-measurement rule).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

BATCH = 16
SIZE = 256
WARM = 3
ITERS = 10


def _fetch(out):
    return float(jnp.sum(out))


def _time(fn, x):
    out = None
    for _ in range(WARM):
        out = fn(x)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(x)
    _fetch(out)
    return (time.perf_counter() - t0) / ITERS * 1000.0


def main():
    from adam_dehaze_tpu.models.branches import (
        HighIntensityDehazeModel,
        MediumIntensityDehazeModel,
    )
    from adam_dehaze_tpu.ops.s2d import (
        make_high_s2d_apply,
        make_medium_chain_apply,
    )

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    dummy = x[:1]
    results = {}

    import os
    m_h = HighIntensityDehazeModel(use_pallas=True)
    vs_h = m_h.init(jax.random.PRNGKey(1), dummy, train=False)
    high_variants = () if os.environ.get("PROBE_MEDIUM_ONLY") else (
        ("high_s2d_canonical_ms", False),
        ("high_s2d_chain_ms", True),
        ("high_s2d_chain_e2b_ms", ("e2b",)),
        ("high_s2d_chain_e1_ms", ("e1",)),
        ("high_s2d_chain_d1_ms", ("d1",)))
    for name, flag in high_variants:
        try:
            f = jax.jit(make_high_s2d_apply(m_h, vs_h, res_chain=flag))
            results[name] = round(_time(f, x), 3)
            print(json.dumps({name: results[name]}), flush=True)
        except Exception as e:
            print(f"{name} failed: {type(e).__name__}: {e}", file=sys.stderr)

    # FAIR medium comparison: all contenders at the serving compute dtype
    # (bf16). An earlier revision built the model at its f32 default, which
    # made the "canonical" row a straw man (28.05 ms vs 22.2 ms at bf16).
    m_m = MediumIntensityDehazeModel(dtype=jnp.bfloat16)
    vs_m = m_m.init(jax.random.PRNGKey(2), dummy, train=False)
    from adam_dehaze_tpu.ops.s2d import make_medium_s2d_apply
    for name, mk in (
            ("medium_canonical_bf16_ms",
             lambda: (lambda im: m_m.apply(vs_m, im, train=False))),
            ("medium_s2d_ms",
             lambda: make_medium_s2d_apply(m_m, vs_m)),
            ("medium_chain_ms",
             lambda: make_medium_chain_apply(m_m, vs_m))):
        try:
            f = jax.jit(mk())
            results[name] = round(_time(f, x), 3)
            print(json.dumps({name: results[name]}), flush=True)
        except Exception as e:
            print(f"{name} failed: {type(e).__name__}: {e}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
