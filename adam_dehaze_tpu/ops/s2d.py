"""Space-to-depth (s2d) serving transform for small-channel conv stacks.

Motivation (benchmarks/profile_micro.json, v5e): a 3x3 conv at C=32 over
256² runs ~10x below its bandwidth bound because XLA pads the lane
(channel) dimension to 128 — C<128 convs waste most of each vector
register. Folding a 2x2 spatial block into channels (C=32 -> 4C=128) makes
every conv in the stack MXU/lane-aligned; the low branch
(`LightweightDehazeModel`, 9 uniform 3x3 convs at C=32, reference:
low_intensity.py:5-54) drops from ~17 ms to ~2-3 ms per 16-image bucket.

The transform is EXACT (not an approximation):

    y = conv3x3_p1(x, W)  <=>  s2d(y) = s2d_conv(s2d(x), T(W))

with T(W) a structured (2, 2, 4*cin, 4*cout) kernel: output phase (a, b) at
s2d position m needs input rows 2m+a-1 .. 2m+a+1, which span s2d rows
{m-1+a, m+a} — a 2-tap window whose start shifts by the phase. One conv
over the (1,1)-padded s2d input yields windows at every start; each output
phase group is then sliced at its own offset (same trick as the sub-pixel
ConvTranspose in nn/blocks.py). Tap mapping: kernel entry
K[u, v, (alpha, beta, ci), (a, b, o)] = W[i, j, ci, o] with
i = 2u + a + alpha - 1, j = 2v + b + beta - 1, zero when i or j leaves
[0, 2] (9 of 16 slots per dimension pair are live).

BatchNorm in eval mode is a per-channel affine, so it folds into the conv
(kernel scale + output shift) and broadcasts over the 4 phase copies of
each channel. This module is therefore a SERVING path (eval mode only);
training keeps the canonical flax modules.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), phase-major channels (a, b, c)."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, "s2d needs even spatial dims"
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (n, h2, w2, a, b, c)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(y: jax.Array) -> jax.Array:
    """Inverse of space_to_depth."""
    n, h2, w2, c4 = y.shape
    c = c4 // 4
    y = y.reshape(n, h2, w2, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * h2, 2 * w2, c)


def s2d_conv3x3_kernel(w: jax.Array) -> jax.Array:
    """Transform a (3, 3, cin, cout) kernel into the structured
    (2, 2, 4*cin, 4*cout) s2d kernel (see module docstring)."""
    ci, co = w.shape[2], w.shape[3]
    k = jnp.zeros((2, 2, 4 * ci, 4 * co), w.dtype)
    for u in (0, 1):
        for v in (0, 1):
            for a in (0, 1):
                for b in (0, 1):
                    for al in (0, 1):
                        for be in (0, 1):
                            i = 2 * u + a + al - 1
                            j = 2 * v + b + be - 1
                            if 0 <= i <= 2 and 0 <= j <= 2:
                                gi = (al * 2 + be) * ci
                                go = (a * 2 + b) * co
                                k = k.at[u, v, gi:gi + ci, go:go + co].set(
                                    w[i, j])
    return k


def s2d_conv3x3(x2: jax.Array, k2: jax.Array, cout: int,
                shift: Optional[jax.Array] = None,
                relu: bool = False) -> jax.Array:
    """Apply a transformed s2d kernel (from `s2d_conv3x3_kernel`) to an s2d
    activation. `shift` is a per-original-channel (cout,) bias/BN shift,
    broadcast over the 4 phases. Returns (N, H2, W2, 4*cout)."""
    n, h2, w2, _ = x2.shape
    yb = jax.lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (n, h2+1, w2+1, 4co)
    groups = [yb[:, a:a + h2, b:b + w2, (a * 2 + b) * cout:(a * 2 + b + 1) * cout]
              for a in (0, 1) for b in (0, 1)]
    y = jnp.concatenate(groups, axis=-1)
    if shift is not None:
        y = y + jnp.tile(shift, 4).astype(y.dtype)
    if relu:
        y = jax.nn.relu(y)
    return y


def _fold_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold eval-mode BatchNorm into (kernel scale, output shift) — f32."""
    s = bn_scale / jnp.sqrt(bn_var + eps)
    return kernel * s[None, None, None, :], bn_bias - s * bn_mean


def make_lightweight_s2d_apply(variables, dtype=jnp.bfloat16):
    """Exact eval-mode serving function for `LightweightDehazeModel`
    (models/branches.py:32-55) running entirely in the s2d domain.

    Takes the model's canonical flax `variables` ({params, batch_stats});
    returns fn(x) -> dehazed, numerically equal to
    `model.apply(variables, x, train=False)` (regression-tested in
    tests/test_s2d.py). BN is folded; all 9 convs are lane-aligned 4C=128
    s2d convs; sigmoid/blend run in-domain; one depth_to_space at the end.
    """
    p = variables["params"]
    bs = variables["batch_stats"]

    def conv_block(name):
        k = p[name]["Conv_0"]["kernel"]
        bn = p[name]["BatchNorm_0"]
        st = bs[name]["BatchNorm_0"]
        k, shift = _fold_bn(k, bn["scale"], bn["bias"], st["mean"], st["var"])
        return s2d_conv3x3_kernel(k).astype(dtype), shift

    k_in, t_in = conv_block("ConvBlock_0")
    res = []
    i = 0
    while f"ResidualBlock_{i}" in p:
        rp, rs = p[f"ResidualBlock_{i}"], bs[f"ResidualBlock_{i}"]
        pair = []
        for j in (0, 1):
            k = rp[f"ConvBlock_{j}"]["Conv_0"]["kernel"]
            bn = rp[f"ConvBlock_{j}"]["BatchNorm_0"]
            st = rs[f"ConvBlock_{j}"]["BatchNorm_0"]
            k, shift = _fold_bn(k, bn["scale"], bn["bias"],
                                st["mean"], st["var"])
            pair.append((s2d_conv3x3_kernel(k).astype(dtype), shift))
        res.append(pair)
        i += 1
    k_mid, t_mid = conv_block("ConvBlock_1")
    k_out = s2d_conv3x3_kernel(p["Conv_0"]["kernel"]).astype(dtype)
    t_out = p["Conv_0"]["bias"]
    alpha = p["skip_alpha"]

    cmid = t_in.shape[0]

    def apply_fn(x):
        x2 = space_to_depth(x.astype(dtype))
        h = s2d_conv3x3(x2, k_in, cmid, t_in, relu=True)
        for (ka, ta), (kb, tb) in res:
            y = s2d_conv3x3(h, ka, cmid, ta, relu=True)
            y = s2d_conv3x3(y, kb, cmid, tb, relu=False)
            h = jax.nn.relu(y + h)
        h = s2d_conv3x3(h, k_mid, cmid, t_mid, relu=True)
        out = s2d_conv3x3(h, k_out, 3, t_out, relu=False)
        out = jax.nn.sigmoid(out)
        a = alpha.astype(dtype)
        blended = (1.0 - a) * x2 + a * out
        return depth_to_space(blended).astype(jnp.float32)

    return apply_fn


def make_serving_apply(model, variables, dtype=jnp.bfloat16):
    """Fastest exact eval-mode apply for a branch model: the s2d path for
    `LightweightDehazeModel`, the canonical flax apply otherwise."""
    from adam_dehaze_tpu.models.branches import LightweightDehazeModel

    if isinstance(model, LightweightDehazeModel):
        return make_lightweight_s2d_apply(variables, dtype=dtype)
    return lambda x: model.apply(variables, x, train=False)
