#!/usr/bin/env python
"""Probe the int8 serving path (round-3 verdict item #9).

Questions:
1. Does the AQT int8 conv actually lower to an s8 x s8 -> s32 convolution in
   the optimized TPU HLO, or does XLA upcast (leaving the 2x int8 MXU peak on
   the table)?
2. Micro timing: one lane-aligned ConvBlock-shaped conv (128ch @ 64^2 x 16)
   bf16 vs AQT int8 vs int8 dot_general (the hardware ceiling reference).

Prints findings as text; run on the real TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    return float(jnp.sum(out))


def timeit(fn, *args, iters=30):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters * 1000.0


key = jax.random.PRNGKey(0)
N, H, C = 16, 64, 128
x = jax.random.uniform(key, (N, H, H, C), jnp.float32)
w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C), jnp.float32) * 0.05

# --- bf16 conv baseline ---
@jax.jit
def conv_bf16(x):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.astype(jnp.float32)

# --- AQT int8 conv (what ops/quant.py routes ConvBlock through) ---
from adam_dehaze_tpu.ops.quant import quantize_apply

def conv_raw(x):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

import flax.linen as nn

class OneConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        from adam_dehaze_tpu.ops.quant import conv_kwargs
        return nn.Conv(C, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                       dtype=jnp.bfloat16, param_dtype=jnp.float32,
                       **conv_kwargs())(x)

m = OneConv()
v = None
def init_once():
    global v
    from adam_dehaze_tpu.ops.quant import quantized_inference
    with quantized_inference():
        vv = m.init(jax.random.PRNGKey(2), x)
    return vv
v = init_once()
conv_int8 = jax.jit(quantize_apply(lambda xx: m.apply(v, xx)))

# --- manual int8 conv: pre-scaled int8 weights, dynamic activation scale ---
w_scale = jnp.max(jnp.abs(w)) / 127.0
w_i8 = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)

@jax.jit
def conv_manual_int8(x):
    s = jnp.max(jnp.abs(x)) / 127.0
    xi = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xi, w_i8, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s * w_scale)

# --- int8 matmul ceiling reference ---
M = N * H * H
a_i8 = jnp.ones((M, C), jnp.int8)
b_i8 = jnp.ones((C, C), jnp.int8)
a_bf = jnp.ones((M, C), jnp.bfloat16)
b_bf = jnp.ones((C, C), jnp.bfloat16)

@jax.jit
def mm_i8(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

@jax.jit
def mm_bf(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def hlo_dtypes(jitted, *args, tag=""):
    try:
        txt = jitted.lower(*args).compile().as_text()
    except Exception as e:
        print(f"[{tag}] compiled HLO unavailable: {e}")
        return
    conv_lines = [l.strip() for l in txt.splitlines()
                  if ("convolution" in l or "dot(" in l) and "=" in l]
    kinds = set()
    for l in conv_lines:
        for t in ("s8", "s32", "bf16", "f32", "s16"):
            if l.split("=")[1].strip().startswith(t):
                kinds.add(t)
    print(f"[{tag}] conv/dot result dtypes in optimized HLO: {sorted(kinds)}")
    for l in conv_lines[:4]:
        print(f"    {l[:140]}")


print("== HLO inspection ==", flush=True)
hlo_dtypes(conv_manual_int8, x, tag="manual-int8-conv")
hlo_dtypes(conv_int8, x, tag="aqt-int8-conv")

print("== timing ==", flush=True)
t_bf = timeit(conv_bf16, x)
print(f"conv bf16        : {t_bf:.3f} ms")
t_q = timeit(conv_int8, x)
print(f"conv aqt-int8    : {t_q:.3f} ms  ({t_bf / t_q:.2f}x vs bf16)")
t_m = timeit(conv_manual_int8, x)
print(f"conv manual-int8 : {t_m:.3f} ms  ({t_bf / t_m:.2f}x vs bf16)")
t_mm_bf = timeit(mm_bf, a_bf, b_bf)
t_mm_i8 = timeit(mm_i8, a_i8, b_i8)
print(f"matmul bf16      : {t_mm_bf:.3f} ms")
print(f"matmul int8      : {t_mm_i8:.3f} ms  ({t_mm_bf / t_mm_i8:.2f}x)")

# Bigger-contraction matmul: does int8 ever reach its 2x peak via XLA here?
M2, K2 = 8192, 512
a2_i8 = jnp.ones((M2, K2), jnp.int8)
b2_i8 = jnp.ones((K2, K2), jnp.int8)
a2_bf = jnp.ones((M2, K2), jnp.bfloat16)
b2_bf = jnp.ones((K2, K2), jnp.bfloat16)
t_bf2 = timeit(mm_bf, a2_bf, b2_bf)
t_i82 = timeit(mm_i8, a2_i8, b2_i8)
print(f"matmul bf16 512K : {t_bf2:.3f} ms")
print(f"matmul int8 512K : {t_i82:.3f} ms  ({t_bf2 / t_i82:.2f}x)")
