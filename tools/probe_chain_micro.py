#!/usr/bin/env python
"""Micro-probe: which part of the fused res/CBAM chain wins or loses vs
XLA, per segment shape. Times isolated stacks at the serving shapes:

  (c=384, 64²)  — high e2b tiles exactly on the MXU
  (c=192, 128²) — high e1/d1, 1.5-tile lane width
  (c=256, 64²)  — medium e2b (the confirmed win)

For each: XLA [res,res], chain [res,res], XLA attn (fused Pallas CBAM
gate), chain [res,res,attn] — so conv-chain gain and in-kernel-CBAM cost
separate cleanly.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

N = 16
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
    return round((time.perf_counter() - t0) / ITERS * 1000.0, 3)


def main():
    from adam_dehaze_tpu.nn.blocks import AttentionBlock, ResidualBlock
    from adam_dehaze_tpu.ops.pallas.res_chain import make_res_attn_chain

    import os
    results = {}
    shapes = () if os.environ.get("PROBE_ONLY_E2B") else (
        (384, 64), (192, 128), (256, 64))
    for c, hw in shapes:
        key = jax.random.PRNGKey(c)
        x = jax.random.uniform(key, (N, hw, hw, c), jnp.bfloat16)
        res = ResidualBlock(c, dtype=jnp.bfloat16)
        attn = AttentionBlock(c, use_pallas=True, dtype=jnp.bfloat16)
        vr1 = res.init(jax.random.PRNGKey(1), x, train=False)
        vr2 = res.init(jax.random.PRNGKey(2), x, train=False)
        va = attn.init(jax.random.PRNGKey(3), x, train=False)
        tag = f"c{c}_{hw}"

        xla_rr = jax.jit(lambda im: res.apply(
            vr2, res.apply(vr1, im, False), False))
        results[f"{tag}_xla_res2"] = _time(xla_rr, x)
        print(json.dumps({f"{tag}_xla_res2": results[f"{tag}_xla_res2"]}),
              flush=True)

        specs_rr = [("res", vr1["params"], vr1["batch_stats"]),
                    ("res", vr2["params"], vr2["batch_stats"])]
        try:
            ch_rr = jax.jit(make_res_attn_chain(specs_rr, c=c))
            results[f"{tag}_chain_res2"] = _time(ch_rr, x)
            print(json.dumps(
                {f"{tag}_chain_res2": results[f"{tag}_chain_res2"]}),
                flush=True)
        except Exception as e:
            print(f"{tag}_chain_res2 failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

        xla_a = jax.jit(lambda im: attn.apply(va, im, False))
        results[f"{tag}_xla_attn"] = _time(xla_a, x)
        print(json.dumps({f"{tag}_xla_attn": results[f"{tag}_xla_attn"]}),
              flush=True)

        specs_rra = specs_rr + [("attn", va["params"], None)]
        try:
            ch_rra = jax.jit(make_res_attn_chain(specs_rra, c=c))
            results[f"{tag}_chain_res2attn"] = _time(ch_rra, x)
            print(json.dumps(
                {f"{tag}_chain_res2attn": results[f"{tag}_chain_res2attn"]}),
                flush=True)
        except Exception as e:
            print(f"{tag}_chain_res2attn failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # The exact high-branch e2b stack ([res,res,attn,res,attn,res,attn],
    # c=384 @64²) isolated: the full-path probe showed chain LOSING here
    # while the 3-layer micro rows above predict a big win — find out which
    # is true in isolation.
    from adam_dehaze_tpu.nn.blocks import AttentionBlock, ResidualBlock
    from adam_dehaze_tpu.ops.pallas.res_chain import make_res_attn_chain
    c, hw = 384, 64
    x = jax.random.uniform(jax.random.PRNGKey(9), (N, hw, hw, c),
                           jnp.bfloat16)
    res = ResidualBlock(c, dtype=jnp.bfloat16)
    attn = AttentionBlock(c, use_pallas=True, dtype=jnp.bfloat16)
    vr = [res.init(jax.random.PRNGKey(10 + i), x, train=False)
          for i in range(4)]
    va = [attn.init(jax.random.PRNGKey(20 + i), x, train=False)
          for i in range(3)]

    def xla_stack(im):
        im = res.apply(vr[0], im, False)
        im = res.apply(vr[1], im, False)
        im = attn.apply(va[0], im, False)
        im = res.apply(vr[2], im, False)
        im = attn.apply(va[1], im, False)
        im = res.apply(vr[3], im, False)
        return attn.apply(va[2], im, False)

    results["e2b_xla_ms"] = _time(jax.jit(xla_stack), x)
    print(json.dumps({"e2b_xla_ms": results["e2b_xla_ms"]}), flush=True)

    specs = [("res", vr[0]["params"], vr[0]["batch_stats"]),
             ("res", vr[1]["params"], vr[1]["batch_stats"]),
             ("attn", va[0]["params"], None),
             ("res", vr[2]["params"], vr[2]["batch_stats"]),
             ("attn", va[1]["params"], None),
             ("res", vr[3]["params"], vr[3]["batch_stats"]),
             ("attn", va[2]["params"], None)]
    try:
        ch = jax.jit(make_res_attn_chain(specs, c=c))
        results["e2b_chain_ms"] = _time(ch, x)
        print(json.dumps({"e2b_chain_ms": results["e2b_chain_ms"]}),
              flush=True)
    except Exception as e:
        print(f"e2b_chain failed: {type(e).__name__}: {e}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
