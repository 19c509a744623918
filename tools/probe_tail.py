#!/usr/bin/env python
"""Quantify the high branch's s2d TAIL cost in context (round-3 follow-up).

The round-3 profile left one named headroom: the high branch's s2d tail
(up4 -> residual -> CBAM -> concat heads -> out/guidance blend) and the
ConvTranspose ups are the only stages still below ~50% of peak in context
(ROUND3.md, PROFILE.md round-3 analysis). Per-stage isolated timings are
dispatch-floor contaminated (~2.4 ms/program), so this probe measures the
tail IN CONTEXT as a difference:

  tail_in_context = t(full s2d apply) - t(prefix apply truncated at the
                    d1 concat, canonical inner stages = the serving path)

and separately times the tail as its own XLA program (same inputs a fused
Pallas tail kernel would take) to give the isolated baseline the kernel
probe will be compared against (same dispatch floor on both sides).

All contenders at the serving dtype (bf16) @ 256²x16 — the fair-dtype rule.
Prints one JSON line per measurement.
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
    from adam_dehaze_tpu.models.branches import HighIntensityDehazeModel
    from adam_dehaze_tpu.nn.blocks import (
        AttentionBlock, ConvBlock, ResidualBlock, UpBlock,
    )
    from adam_dehaze_tpu.ops.s2d import (
        _fold_bn,
        _fold_convblock,
        _s2d_residual,
        _sub,
        depth_to_space,
        make_high_s2d_apply,
        s2d_attention,
        s2d_concat,
        s2d_conv,
        s2d_conv_kernel,
        s2d_up4,
        space_to_depth,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.float32)

    on_tpu = jax.default_backend() == "tpu"
    model = HighIntensityDehazeModel(use_pallas=on_tpu, dtype=dt)
    variables = model.init(jax.random.PRNGKey(1), x[:1], train=False)
    p = variables["params"]
    bs = variables["batch_stats"]
    c = model.base_channels

    results = {}

    # --- full serving apply (current dispatch: s2d, canonical inner) ---
    full = jax.jit(make_high_s2d_apply(model, variables, dtype=dt))
    results["full_ms"] = _time(full, x)

    # --- prefix truncated at the d1 concat (canonical inner stages) ---
    res2 = ResidualBlock(2 * c, dtype=dt)
    res4 = ResidualBlock(4 * c, dtype=dt)
    attn2 = AttentionBlock(2 * c, use_pallas=on_tpu, dtype=dt)
    attn4 = AttentionBlock(4 * c, use_pallas=on_tpu, dtype=dt)
    stem = ConvBlock(c, 7, dtype=dt)
    down1 = ConvBlock(2 * c, 4, stride=2, padding=1, dtype=dt)
    down2 = ConvBlock(4 * c, 4, stride=2, padding=1, dtype=dt)
    up0 = UpBlock(2 * c, dtype=dt)

    def prefix(xi):
        xin = xi.astype(dt)
        f0 = stem.apply(_sub(variables, "ConvBlock_2"), xin, False)
        e1 = down1.apply(_sub(variables, "ConvBlock_3"), f0, False)
        e1 = res2.apply(_sub(variables, "ResidualBlock_0"), e1, False)
        e1 = res2.apply(_sub(variables, "ResidualBlock_1"), e1, False)
        e1 = attn2.apply(_sub(variables, "AttentionBlock_0"), e1, False)
        e2 = down2.apply(_sub(variables, "ConvBlock_4"), e1, False)
        b = res4.apply(_sub(variables, "ResidualBlock_2"), e2, False)
        b = res4.apply(_sub(variables, "ResidualBlock_3"), b, False)
        b = attn4.apply(_sub(variables, "AttentionBlock_1"), b, False)
        b = res4.apply(_sub(variables, "ResidualBlock_4"), b, False)
        b = attn4.apply(_sub(variables, "AttentionBlock_2"), b, False)
        b = res4.apply(_sub(variables, "ResidualBlock_5"), b, False)
        b = attn4.apply(_sub(variables, "AttentionBlock_3"), b, False)
        d1 = up0.apply(_sub(variables, "UpBlock_0"), b, False)
        d1 = res2.apply(_sub(variables, "ResidualBlock_6"), d1, False)
        d1 = attn2.apply(_sub(variables, "AttentionBlock_4"), d1, False)
        d1 = jnp.concatenate([d1, e1], axis=-1)
        # include f0s: the tail consumes it, the prefix must produce it
        return d1, space_to_depth(f0)

    prefix_j = jax.jit(prefix)
    results["prefix_ms"] = _time(prefix_j, x)
    results["tail_in_context_ms"] = results["full_ms"] - results["prefix_ms"]

    # --- isolated XLA tail program (what the fused kernel competes with) ---
    kg1, tg1 = _fold_convblock(p, bs, "ConvBlock_0")
    kg2, tg2 = _fold_convblock(p, bs, "ConvBlock_1")
    kgo, tgo = p["Conv_0"]["kernel"], p["Conv_0"]["bias"]
    kup, tup_ = _fold_bn(p["UpBlock_1"]["ConvTranspose_0"]["kernel"],
                         p["UpBlock_1"]["BatchNorm_0"]["scale"],
                         p["UpBlock_1"]["BatchNorm_0"]["bias"],
                         bs["UpBlock_1"]["BatchNorm_0"]["mean"],
                         bs["UpBlock_1"]["BatchNorm_0"]["var"])
    s_up = (p["UpBlock_1"]["BatchNorm_0"]["scale"]
            / jnp.sqrt(bs["UpBlock_1"]["BatchNorm_0"]["var"] + 1e-5))
    tup = tup_ + s_up * p["UpBlock_1"]["ConvTranspose_0"]["bias"]
    kh1, th1 = _fold_convblock(p, bs, "ConvBlock_5")
    kh2, th2 = _fold_convblock(p, bs, "ConvBlock_6")
    kout, tout = p["Conv_1"]["kernel"], p["Conv_1"]["bias"]
    kg1s = s2d_conv_kernel(kg1).astype(dt)
    kg2s = s2d_conv_kernel(kg2).astype(dt)
    kgos = s2d_conv_kernel(kgo).astype(dt)
    kh1s = s2d_conv_kernel(kh1).astype(dt)
    kh2s = s2d_conv_kernel(kh2).astype(dt)
    kouts = s2d_conv_kernel(kout).astype(dt)

    def make_tail(with_attn=True, with_guidance=True):
        def tail(d1, f0s, x2):
            if with_guidance:
                g = s2d_conv(x2, kg1s, 16, k=3, shift=tg1, relu=True)
                g = s2d_conv(g, kg2s, 16, k=3, shift=tg2, relu=True)
                guidance = jax.nn.sigmoid(s2d_conv(g, kgos, 1, k=1, shift=tgo))
            else:
                # keep the blend multiply; only the 3 guidance convs drop out
                guidance = jax.nn.sigmoid(jnp.mean(x2, axis=-1, keepdims=True)
                                          * jnp.ones((1, 1, 1, 4), dt))
            d2 = s2d_up4(d1, kup.astype(dt), shift=tup, relu=True)
            d2 = _s2d_residual(d2, p, bs, "ResidualBlock_7", c, dt)
            if with_attn:
                d2 = s2d_attention(d2, p["AttentionBlock_5"], c, dtype=dt)
            d2 = s2d_concat(d2, f0s, c, c)
            h = s2d_conv(d2, kh1s, c, k=3, shift=th1, relu=True)
            h = s2d_conv(h, kh2s, c // 2, k=3, shift=th2, relu=True)
            res = s2d_conv(h, kouts, 3, k=3, shift=tout)
            res = jnp.tanh(res)
            n, h2, w2, _ = res.shape
            res = (res.reshape(n, h2, w2, 4, 3)
                   * guidance.reshape(n, h2, w2, 4, 1))
            out = jnp.clip(x2.reshape(n, h2, w2, 4, 3) + res, 0.0, 1.0)
            return depth_to_space(out.reshape(n, h2, w2, 12)).astype(
                jnp.float32)
        return tail

    h2 = SIZE // 2
    kd = jax.random.PRNGKey(2)
    d1_in = jax.random.normal(kd, (BATCH, h2, h2, 4 * c), dt)
    f0s_in = jax.random.normal(kd, (BATCH, h2, h2, 4 * c), dt)
    x2_in = space_to_depth(x).astype(dt)
    tail_j = jax.jit(make_tail())

    if os.environ.get("PROBE_CHECK"):
        # Decomposition integrity: tail(prefix(x), s2d(x)) == full(x).
        d1_p, f0s_p = prefix_j(x)
        recomposed = tail_j(d1_p, f0s_p, x2_in)
        ref = full(x)
        err = float(jnp.max(jnp.abs(recomposed - ref)))
        results["decomposition_max_err"] = err
        assert err < 1e-2, f"prefix+tail != full (max err {err})"
    results["tail_isolated_ms"] = _time(tail_j, d1_in, f0s_in, x2_in)

    # Stage ablations INSIDE the isolated tail program: same dispatch floor
    # on every row, so differences are in-program stage costs.
    no_attn = _time(jax.jit(make_tail(with_attn=False)), d1_in, f0s_in, x2_in)
    no_guid = _time(jax.jit(make_tail(with_guidance=False)),
                    d1_in, f0s_in, x2_in)
    results["tail_no_attn_ms"] = no_attn
    results["tail_no_guidance_ms"] = no_guid
    results["attn_in_tail_ms"] = results["tail_isolated_ms"] - no_attn
    results["guidance_in_tail_ms"] = results["tail_isolated_ms"] - no_guid

    # --- fused Pallas tail chain (ops/pallas/tail_chain.py) ---
    if on_tpu or os.environ.get("PROBE_CHAIN"):
        from adam_dehaze_tpu.ops.pallas.tail_chain import (
            make_high_tail_chain,
        )
        interp = not on_tpu
        strips = [int(s) for s in
                  os.environ.get("PROBE_STRIPS", "16").split(",")]
        for strip in strips:
            try:
                tfn = make_high_tail_chain(model, variables, dtype=dt,
                                           strip=strip, interpret=interp)
                chain = jax.jit(
                    lambda d, f, z, _f=tfn: depth_to_space(_f(d, f, z)))
                results[f"tail_chain_s{strip}_ms"] = _time(
                    chain, d1_in, f0s_in, x2_in)
                err = float(jnp.max(jnp.abs(
                    chain(d1_in, f0s_in, x2_in)
                    - tail_j(d1_in, f0s_in, x2_in))))
                results[f"tail_chain_s{strip}_max_err"] = err
            except Exception as e:
                print(f"tail chain strip={strip} failed: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
        try:
            full_chain = jax.jit(make_high_s2d_apply(
                model, variables, dtype=dt, tail_chain=True,
                interpret=interp))
            results["full_tail_chain_ms"] = _time(full_chain, x)
        except Exception as e:
            print(f"full tail-chain apply failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # analytics
    gf_tail = 68.9  # per image @256² (probe header derivation)
    for k in ("tail_in_context_ms", "tail_isolated_ms"):
        ms = results[k]
        if ms > 0:
            results[k + "_tfs"] = round(gf_tail * BATCH / ms, 1)
    results = {k: round(v, 3) if isinstance(v, float) else v
               for k, v in results.items()}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
