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


def _s2d_meta(k: int):
    """Window geometry for an odd-k stride-1 'same' conv in the s2d domain:
    (window_size W2, pad_lo, pad_hi, per-phase output slice offsets)."""
    pad = (k - 1) // 2
    starts, ends = [], []
    for a in (0, 1):
        ps = []
        for i in range(k):
            r = a + i - pad
            al = r % 2
            ps.append((r - al) // 2)
        starts.append(min(ps))
        ends.append(max(ps))
    w2 = max(e - s + 1 for s, e in zip(starts, ends))
    pad_lo = -starts[0]
    pad_hi = starts[1] + w2 - 1
    offs = [s + pad_lo for s in starts]
    return w2, pad_lo, pad_hi, offs


def s2d_conv_kernel(w: jax.Array) -> jax.Array:
    """Transform an odd-k (k, k, cin, cout) stride-1 'same' kernel into the
    structured (W2, W2, 4*cin, 4*cout) s2d kernel. Tap mapping per
    dimension: output phase a, window offset u, input phase alpha select
    raw tap i = 2*(u - pad_lo) + a + alpha + (k-1)//2 ... computed via the
    same (r -> p, alpha) decomposition as `_s2d_meta`; out-of-range taps are
    zero (gathered from a zero-padded kernel row/col)."""
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    w2, pad_lo, _, offs = _s2d_meta(k)
    pad_k = (k - 1) // 2
    starts = [o - pad_lo for o in offs]  # per-phase window start rows
    # idx[u, a, alpha] -> raw tap i in [0, k-1], or k for the zero slot.
    idx = np.full((w2, 2, 2), k, np.int32)
    for a in (0, 1):
        for i in range(k):
            r = a + i - pad_k
            al = r % 2
            p = (r - al) // 2
            u = p - starts[a]
            idx[u, a, al] = i
    wpad = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # zero slot at k
    ii = jnp.asarray(idx)  # (w2, 2, 2)
    # K'[u, a, al, v, b, be, ci, co]
    kk = wpad[ii[:, :, :, None, None, None], ii[None, None, None, :, :, :]]
    # -> (u, v, al, be, ci, a, b, co) -> (w2, w2, 4ci, 4co)
    kk = kk.transpose(0, 3, 2, 5, 6, 1, 4, 7)
    return kk.reshape(w2, w2, 4 * ci, 4 * co)


def s2d_conv(x2: jax.Array, k2: jax.Array, cout: int, k: int = 3,
             shift: Optional[jax.Array] = None,
             relu: bool = False) -> jax.Array:
    """Apply a transformed s2d kernel (from `s2d_conv_kernel`) to an s2d
    activation. `shift` is a per-original-channel (cout,) bias/BN shift,
    broadcast over the 4 phases. Returns (N, H2, W2, 4*cout)."""
    n, h2, w2d, _ = x2.shape
    _, pad_lo, pad_hi, offs = _s2d_meta(k)
    # (Sublane-aligning the H2+1-row conv output by extra hi-padding was
    # tried and measured neutral on v5e — the odd row count is not what
    # limits these convs.)
    yb = jax.lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1),
        padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    groups = [yb[:, offs[a]:offs[a] + h2, offs[b]:offs[b] + w2d,
                 (a * 2 + b) * cout:(a * 2 + b + 1) * cout]
              for a in (0, 1) for b in (0, 1)]
    y = jnp.concatenate(groups, axis=-1)
    if shift is not None:
        y = y + jnp.tile(shift, 4).astype(y.dtype)
    if relu:
        y = jax.nn.relu(y)
    return y


def s2d_conv3x3_kernel(w: jax.Array) -> jax.Array:
    """(3, 3, cin, cout) -> (2, 2, 4*cin, 4*cout) (see `s2d_conv_kernel`)."""
    return s2d_conv_kernel(w)


def s2d_conv3x3(x2, k2, cout, shift=None, relu=False):
    return s2d_conv(x2, k2, cout, k=3, shift=shift, relu=relu)


def s2d_down4_kernel(w: jax.Array) -> jax.Array:
    """Transform a (4, 4, cin, cout) stride-2 pad-1 downsampling kernel into
    a (3, 3, 4*cin, cout) stride-1 s2d kernel. The stride-2 output grid IS
    the s2d grid, so the result leaves the s2d domain (plain cout channels):
    y[m] = sum_t x[2m + t - 1] . W[t], raw rows 2m-1..2m+2 span s2d rows
    m-1..m+1; tap t = 2*(u-1) + alpha + 1."""
    ci, co = w.shape[2], w.shape[3]
    idx = np.full((3, 2), 4, np.int32)  # 4 == zero slot
    for u in range(3):
        for al in (0, 1):
            t = 2 * u + al - 1
            if 0 <= t <= 3:
                idx[u, al] = t
    wpad = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    ii = jnp.asarray(idx)  # (3, 2)
    kk = wpad[ii[:, :, None, None], ii[None, None, :, :]]
    # (u, al, v, be, ci, co) -> (u, v, al, be, ci, co) -> (3, 3, 4ci, co)
    kk = kk.transpose(0, 2, 1, 3, 4, 5)
    return kk.reshape(3, 3, 4 * ci, co)


def s2d_down4(x2: jax.Array, k2: jax.Array,
              shift: Optional[jax.Array] = None,
              relu: bool = False) -> jax.Array:
    """Stride-2 k4 downsampling conv consuming an s2d activation and
    producing a PLAIN (non-s2d) activation on the half-res grid."""
    y = jax.lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if shift is not None:
        y = y + shift.astype(y.dtype)
    if relu:
        y = jax.nn.relu(y)
    return y


def s2d_stem7_kernel(w: jax.Array) -> jax.Array:
    """Transform a (7, 7, cin, cout) stride-2 pad-3 stem kernel (the
    torchvision ResNet stem, nn/resnet.py:95) into a (4, 4, 4*cin, cout)
    stride-1 s2d kernel. Like `s2d_down4_kernel`, the stride-2 output grid
    IS the s2d grid, so the result leaves the s2d domain:

        y[m] = sum_{t=0..6} x[2m + t - 3] . W[t],   raw rows 2m-3 .. 2m+3
        span s2d rows m-2 .. m+1;  tap t = 2u + alpha - 1  (u in 0..3).

    7 of 8 (u, alpha) slots are live per dimension => 49/64 dense fill —
    only 1.31x MAC waste (vs 5.2x for the stride-1 k7 transform that round 2
    measured and rejected), with every issued MAC on the stride-2 output
    grid instead of the 4x-larger input grid."""
    ci, co = w.shape[2], w.shape[3]
    idx = np.full((4, 2), 7, np.int32)  # 7 == zero slot
    for u in range(4):
        for al in (0, 1):
            t = 2 * u + al - 1
            if 0 <= t <= 6:
                idx[u, al] = t
    wpad = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    ii = jnp.asarray(idx)  # (4, 2)
    kk = wpad[ii[:, :, None, None], ii[None, None, :, :]]
    # (u, al, v, be, ci, co) -> (u, v, al, be, ci, co) -> (4, 4, 4ci, co)
    kk = kk.transpose(0, 2, 1, 3, 4, 5)
    return kk.reshape(4, 4, 4 * ci, co)


def s2d_stem7(x2: jax.Array, k2: jax.Array,
              shift: Optional[jax.Array] = None,
              relu: bool = False) -> jax.Array:
    """Stride-2 k7 pad-3 stem conv consuming an s2d activation, emitting a
    PLAIN activation on the half-res grid (taps span s2d rows m-2..m+1 =>
    asymmetric (2, 1) padding)."""
    y = jax.lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if shift is not None:
        y = y + shift.astype(y.dtype)
    if relu:
        y = jax.nn.relu(y)
    return y


def make_classifier_s2d_apply(classifier, variables, dtype=jnp.bfloat16):
    """Exact eval-mode serving path for `FogIntensityClassifier` with a
    resnet backbone (models/classifier.py): the 7x7/s2 stem — measured at 8%
    of peak in the canonical layout (benchmarks/PROFILE.md stage table) —
    consumes the s2d layout natively via `s2d_stem7`; everything after the
    stem (maxpool, residual stages, pool, head) runs on the canonical flax
    blocks. Returns fn(x) -> (logits, features), numerically equal to
    `classifier.apply(variables, x, train=False)` up to dtype rounding."""
    from flax import linen as nn

    from adam_dehaze_tpu.nn.resnet import BasicBlock, Bottleneck

    p = variables["params"]
    bs = variables["batch_stats"]
    bb_name = next(k for k in p if k.startswith("ResNet"))
    bbp, bbs = p[bb_name], bs[bb_name]

    k_stem, t_stem = _fold_bn(
        bbp["Conv_0"]["kernel"], bbp["BatchNorm_0"]["scale"],
        bbp["BatchNorm_0"]["bias"], bbs["BatchNorm_0"]["mean"],
        bbs["BatchNorm_0"]["var"])
    k2 = s2d_stem7_kernel(k_stem).astype(dtype)

    name = classifier.model_name
    stage_sizes = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
                   "resnet50": (3, 4, 6, 3)}[name]
    bottleneck = name == "resnet50"
    block_cls = Bottleneck if bottleneck else BasicBlock
    block_name = "Bottleneck" if bottleneck else "BasicBlock"
    widths = (64, 128, 256, 512)

    d0k, d0b = p["Dense_0"]["kernel"], p["Dense_0"]["bias"]
    d1k, d1b = p["Dense_1"]["kernel"], p["Dense_1"]["bias"]

    def apply_fn(x):
        x2 = space_to_depth(x.astype(dtype))
        h = s2d_stem7(x2, k2, shift=t_stem, relu=True)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        bi = 0
        for i, (n_blocks, w) in enumerate(zip(stage_sizes, widths)):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                mod = block_cls(w, stride=stride, dtype=dtype)
                sub = {"params": bbp[f"{block_name}_{bi}"],
                       "batch_stats": bbs[f"{block_name}_{bi}"]}
                h = mod.apply(sub, h, False)
                bi += 1
        feats = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
        # Head in compute dtype (matches nn.Dense(dtype=dt) semantics).
        hh = feats.astype(dtype) @ d0k.astype(dtype) + d0b.astype(dtype)
        hh = jax.nn.relu(hh)
        logits = hh @ d1k.astype(dtype) + d1b.astype(dtype)
        return logits.astype(jnp.float32), feats

    return apply_fn


def make_classifier_serving_apply(classifier, variables, dtype=jnp.bfloat16):
    """Fastest exact eval-mode apply for the fog classifier: s2d stem for
    resnet backbones, canonical apply otherwise."""
    if classifier.model_name.startswith("resnet"):
        return make_classifier_s2d_apply(classifier, variables, dtype=dtype)
    return lambda x: classifier.apply(variables, x)


def s2d_up4(x: jax.Array, w: jax.Array,
            shift: Optional[jax.Array] = None,
            relu: bool = False) -> jax.Array:
    """ConvTranspose(4, 4, stride 2, torch pad 1) consuming a PLAIN
    activation and emitting the 2x-res result in the S2D DOMAIN — the
    sub-pixel decomposition (nn/blocks.py:_SubpixelConvTranspose4x4)
    already computes the four phase groups; skipping its pixel-shuffle IS
    the s2d layout. `shift` is the per-channel (cout,) bias+BN shift."""
    cout = w.shape[3]
    n, h, wd = x.shape[:3]
    phases = [w[a::2, b::2] for a in (0, 1) for b in (0, 1)]
    k2 = jnp.concatenate(phases, axis=-1).astype(x.dtype)
    yb = jax.lax.conv_general_dilated(
        x, k2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    groups = [yb[:, a:a + h, b:b + wd,
                 (a * 2 + b) * cout:(a * 2 + b + 1) * cout]
              for a in (0, 1) for b in (0, 1)]
    y = jnp.concatenate(groups, axis=-1)
    if shift is not None:
        y = y + jnp.tile(shift, 4).astype(y.dtype)
    if relu:
        y = jax.nn.relu(y)
    return y


def s2d_concat(a2: jax.Array, b2: jax.Array, ca: int, cb: int) -> jax.Array:
    """Channel-concat in the s2d domain: phase blocks interleave, so plain
    concatenation of the two s2d tensors would scramble phase order."""
    n, h2, w2, _ = a2.shape
    za = a2.reshape(n, h2, w2, 4, ca)
    zb = b2.reshape(n, h2, w2, 4, cb)
    return jnp.concatenate([za, zb], axis=-1).reshape(n, h2, w2, 4 * (ca + cb))


def s2d_attention(x2: jax.Array, params, c: int,
                  dtype=jnp.bfloat16) -> jax.Array:
    """CBAM AttentionBlock (nn/blocks.py:80-120) evaluated in the s2d
    domain: channel stats aggregate over (H2, W2, phase); the 7x7 spatial
    stencil becomes an s2d conv over the per-phase (mean, max) maps."""
    n, h2, w2, _ = x2.shape
    z = x2.reshape(n, h2, w2, 4, c)
    avg = jnp.mean(z, axis=(1, 2, 3))
    mx = jnp.max(z, axis=(1, 2, 3))
    k0 = params["Dense_0"]["kernel"].astype(dtype)
    k1 = params["Dense_1"]["kernel"].astype(dtype)

    def mlp(v):
        return jax.nn.relu(v @ k0) @ k1

    gate_c = jax.nn.sigmoid(mlp(avg) + mlp(mx))  # (n, c)
    x2 = x2 * jnp.tile(gate_c, (1, 4))[:, None, None, :]

    z = x2.reshape(n, h2, w2, 4, c)
    stats = jnp.stack([jnp.mean(z, axis=-1), jnp.max(z, axis=-1)],
                      axis=-1)                       # (n, h2, w2, 4, 2)
    stats = stats.reshape(n, h2, w2, 8)              # phase-major, stat-fast
    k7 = s2d_conv_kernel(params["spatial_conv"]).astype(dtype)
    gate_s = jax.nn.sigmoid(s2d_conv(stats, k7, 1, k=7))  # (n, h2, w2, 4)
    return (z * gate_s.reshape(n, h2, w2, 4, 1)).reshape(x2.shape)


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


def _fold_convblock(p, bs, name):
    """Fold a ConvBlock's (Conv_0 kernel, BatchNorm_0) into (kernel, shift)
    in f32."""
    k = p[name]["Conv_0"]["kernel"]
    bn = p[name]["BatchNorm_0"]
    st = bs[name]["BatchNorm_0"]
    return _fold_bn(k, bn["scale"], bn["bias"], st["mean"], st["var"])


def _sub(variables, name):
    """Slice a submodule's variable dict out of the parent's."""
    out = {"params": variables["params"][name]}
    if name in variables.get("batch_stats", {}):
        out["batch_stats"] = variables["batch_stats"][name]
    return out


def _s2d_residual(h, p, bs, name, c, dtype):
    """ResidualBlock (two folded ConvBlocks + relu skip) in the s2d domain."""
    ka, ta = _fold_convblock(p[name], bs[name], "ConvBlock_0")
    kb, tb = _fold_convblock(p[name], bs[name], "ConvBlock_1")
    y = s2d_conv(h, s2d_conv_kernel(ka).astype(dtype), c, k=3,
                 shift=ta, relu=True)
    y = s2d_conv(y, s2d_conv_kernel(kb).astype(dtype), c, k=3,
                 shift=tb, relu=False)
    return jax.nn.relu(y + h)


def make_high_s2d_apply(model, variables, dtype=jnp.bfloat16,
                        res_chain: Optional[bool] = None,
                        tail_chain: bool = False,
                        interpret: bool = False):
    """Exact eval-mode serving path for `HighIntensityDehazeModel`
    (models/branches.py:176-238) with the FULL-RES (256²) stages — stem,
    guidance, decoder tail, heads, attention — in the lane-aligned s2d
    domain and the inner (c>=192) stages on the canonical flax blocks or,
    on TPU, fused res/CBAM Pallas chains (ops/pallas/res_chain.py) that
    keep each same-shape segment VMEM-resident.

    Profile rationale (benchmarks/profile_branches.json): the c<128 stages
    at full resolution run ~5-10x below their bounds from lane padding;
    s2d packs 2x2 spatial blocks into channels (96 -> 384). Boundary
    crossings are free: the k4/s2 down conv consumes the s2d layout
    natively and the sub-pixel ConvTranspose emits it natively.

    res_chain: which segments run as fused chains — None/False -> none,
    True -> all three, or a collection drawn from {"e1", "e2b", "d1"}.
    Measured on v5e (logs/probe_res_chain.log): the c=384 e2b segment is an
    exact 3x3-tile MXU fit and wins; the c=192 segments pad to 2x2 tiles
    (56% MXU utilization) and lose to XLA's convs, so per-segment choice
    matters.

    tail_chain: run everything after the d1 concat (up4 + residual + CBAM
    + concat heads + guidance + blend) as ONE fused Pallas program per
    image (ops/pallas/tail_chain.py) instead of ~10 XLA ops with HBM
    round-trips between them. Dispatch choice is measurement-driven
    (tools/probe_tail.py).
    """
    from adam_dehaze_tpu.nn.blocks import AttentionBlock, ConvBlock, ResidualBlock, UpBlock

    p = variables["params"]
    bs = variables["batch_stats"]
    c = model.base_channels
    dt = dtype

    # Folded s2d kernels (f32 fold, cast to compute dtype).
    kg1, tg1 = _fold_convblock(p, bs, "ConvBlock_0")     # guidance 3->16
    kg2, tg2 = _fold_convblock(p, bs, "ConvBlock_1")     # guidance 16->16
    kgo = p["Conv_0"]["kernel"]                          # 1x1 16->1 (+bias)
    tgo = p["Conv_0"]["bias"]
    kup, tup_ = _fold_bn(p["UpBlock_1"]["ConvTranspose_0"]["kernel"],
                         p["UpBlock_1"]["BatchNorm_0"]["scale"],
                         p["UpBlock_1"]["BatchNorm_0"]["bias"],
                         bs["UpBlock_1"]["BatchNorm_0"]["mean"],
                         bs["UpBlock_1"]["BatchNorm_0"]["var"])
    # ConvTranspose bias folds into the BN shift: shift += s * bias.
    s_up = (p["UpBlock_1"]["BatchNorm_0"]["scale"]
            / jnp.sqrt(bs["UpBlock_1"]["BatchNorm_0"]["var"] + 1e-5))
    tup = tup_ + s_up * p["UpBlock_1"]["ConvTranspose_0"]["bias"]
    kh1, th1 = _fold_convblock(p, bs, "ConvBlock_5")     # head 2c->c
    kh2, th2 = _fold_convblock(p, bs, "ConvBlock_6")     # head c->c/2
    kout = p["Conv_1"]["kernel"]                         # 3x3 c/2->3 (+bias)
    tout = p["Conv_1"]["bias"]

    kg1s = s2d_conv_kernel(kg1).astype(dt)
    kg2s = s2d_conv_kernel(kg2).astype(dt)
    kgos = s2d_conv_kernel(kgo).astype(dt)
    kh1s = s2d_conv_kernel(kh1).astype(dt)
    kh2s = s2d_conv_kernel(kh2).astype(dt)
    kouts = s2d_conv_kernel(kout).astype(dt)

    # Canonical flax blocks for the aligned inner stages. The 7x7 stem and
    # the k4/s2 down conv also stay canonical: a k=7 s2d kernel has 19%
    # fill (5.2x MAC waste), which measured slower than the canonical stem.
    res2 = ResidualBlock(2 * c, dtype=dt)
    res4 = ResidualBlock(4 * c, dtype=dt)
    attn2 = AttentionBlock(2 * c, use_pallas=model.use_pallas, dtype=dt)
    attn4 = AttentionBlock(4 * c, use_pallas=model.use_pallas, dtype=dt)
    stem = ConvBlock(c, 7, dtype=dt)
    down1 = ConvBlock(2 * c, 4, stride=2, padding=1, dtype=dt)
    down2 = ConvBlock(4 * c, 4, stride=2, padding=1, dtype=dt)
    up0 = UpBlock(2 * c, dtype=dt)

    if res_chain is None or res_chain is False:
        segments = set()
    elif res_chain is True:
        segments = {"e1", "e2b", "d1"}
    else:
        segments = set(res_chain)
    if segments:
        from adam_dehaze_tpu.ops.pallas.res_chain import (
            make_res_attn_chain,
            segment_specs,
        )
    if "e1" in segments:
        chain_e1 = make_res_attn_chain(segment_specs(
            p, bs, ["ResidualBlock_0", "ResidualBlock_1",
                    "AttentionBlock_0"]), c=2 * c, dtype=dt,
            interpret=interpret)
    else:
        def chain_e1(v):
            v = res2.apply(_sub(variables, "ResidualBlock_0"), v, False)
            v = res2.apply(_sub(variables, "ResidualBlock_1"), v, False)
            return attn2.apply(_sub(variables, "AttentionBlock_0"), v, False)
    if "e2b" in segments:
        chain_e2b = make_res_attn_chain(segment_specs(
            p, bs, ["ResidualBlock_2", "ResidualBlock_3", "AttentionBlock_1",
                    "ResidualBlock_4", "AttentionBlock_2",
                    "ResidualBlock_5", "AttentionBlock_3"]),
            c=4 * c, dtype=dt, interpret=interpret)
    else:
        def chain_e2b(v):
            v = res4.apply(_sub(variables, "ResidualBlock_2"), v, False)
            v = res4.apply(_sub(variables, "ResidualBlock_3"), v, False)
            v = attn4.apply(_sub(variables, "AttentionBlock_1"), v, False)
            v = res4.apply(_sub(variables, "ResidualBlock_4"), v, False)
            v = attn4.apply(_sub(variables, "AttentionBlock_2"), v, False)
            v = res4.apply(_sub(variables, "ResidualBlock_5"), v, False)
            return attn4.apply(_sub(variables, "AttentionBlock_3"), v, False)
    if "d1" in segments:
        chain_d1 = make_res_attn_chain(segment_specs(
            p, bs, ["ResidualBlock_6", "AttentionBlock_4"]),
            c=2 * c, dtype=dt, interpret=interpret)
    else:
        def chain_d1(v):
            v = res2.apply(_sub(variables, "ResidualBlock_6"), v, False)
            return attn2.apply(_sub(variables, "AttentionBlock_4"), v, False)

    if tail_chain:
        from adam_dehaze_tpu.ops.pallas.tail_chain import make_high_tail_chain
        tail_fn = make_high_tail_chain(model, variables, dtype=dt,
                                       interpret=interpret)
    else:
        tail_fn = None

    def apply_fn(x):
        xin = x.astype(dt)
        x2 = space_to_depth(xin)

        f0 = stem.apply(_sub(variables, "ConvBlock_2"), xin, False)
        f0s = space_to_depth(f0)                         # for the d2 concat

        e1 = down1.apply(_sub(variables, "ConvBlock_3"), f0, False)
        e1 = chain_e1(e1)

        e2 = down2.apply(_sub(variables, "ConvBlock_4"), e1, False)
        b = chain_e2b(e2)

        d1 = up0.apply(_sub(variables, "UpBlock_0"), b, False)
        d1 = chain_d1(d1)
        d1 = jnp.concatenate([d1, e1], axis=-1)          # plain, 128², 4c

        if tail_fn is not None:
            return depth_to_space(
                tail_fn(d1, f0s, x2)).astype(jnp.float32)

        g = s2d_conv(x2, kg1s, 16, k=3, shift=tg1, relu=True)
        g = s2d_conv(g, kg2s, 16, k=3, shift=tg2, relu=True)
        guidance = jax.nn.sigmoid(
            s2d_conv(g, kgos, 1, k=1, shift=tgo))        # (n, h2, w2, 4)

        d2 = s2d_up4(d1, kup.astype(dt), shift=tup, relu=True)  # s2d, c
        d2 = _s2d_residual(d2, p, bs, "ResidualBlock_7", c, dt)
        d2 = s2d_attention(d2, p["AttentionBlock_5"], c, dtype=dt)
        d2 = s2d_concat(d2, f0s, c, c)                   # s2d, 2c

        h = s2d_conv(d2, kh1s, c, k=3, shift=th1, relu=True)
        h = s2d_conv(h, kh2s, c // 2, k=3, shift=th2, relu=True)
        res = s2d_conv(h, kouts, 3, k=3, shift=tout)
        res = jnp.tanh(res)

        n, h2, w2, _ = res.shape
        res = res.reshape(n, h2, w2, 4, 3) * guidance.reshape(n, h2, w2, 4, 1)
        out = jnp.clip(x2.reshape(n, h2, w2, 4, 3) + res, 0.0, 1.0)
        return depth_to_space(out.reshape(n, h2, w2, 12)).astype(jnp.float32)

    return apply_fn


def make_medium_s2d_apply(model, variables, dtype=jnp.bfloat16,
                          tail_chain: bool = False,
                          interpret: bool = False):
    """Exact eval-mode serving path for `MediumIntensityDehazeModel`
    (models/branches.py:90-137): stem, decoder tail, and heads in the s2d
    domain; inner stages canonical. Same rationale as
    `make_high_s2d_apply`.

    tail_chain: run everything after the d1 concat (up4 + residual +
    concat heads + blend) as ONE fused Pallas program per image
    (ops/pallas/tail_chain.py:make_medium_tail_chain) instead of ~7 XLA
    ops. Dispatch choice is measurement-driven (tools/probe_medium_tail.py).
    """
    from adam_dehaze_tpu.nn.blocks import ConvBlock, ResidualBlock, UpBlock

    p = variables["params"]
    bs = variables["batch_stats"]
    c = model.base_channels
    dt = dtype

    kup, tup_ = _fold_bn(p["UpBlock_1"]["ConvTranspose_0"]["kernel"],
                         p["UpBlock_1"]["BatchNorm_0"]["scale"],
                         p["UpBlock_1"]["BatchNorm_0"]["bias"],
                         bs["UpBlock_1"]["BatchNorm_0"]["mean"],
                         bs["UpBlock_1"]["BatchNorm_0"]["var"])
    s_up = (p["UpBlock_1"]["BatchNorm_0"]["scale"]
            / jnp.sqrt(bs["UpBlock_1"]["BatchNorm_0"]["var"] + 1e-5))
    tup = tup_ + s_up * p["UpBlock_1"]["ConvTranspose_0"]["bias"]
    kh1, th1 = _fold_convblock(p, bs, "ConvBlock_3")     # head c
    kh2, th2 = _fold_convblock(p, bs, "ConvBlock_4")     # head c/2
    kout = p["Conv_0"]["kernel"]
    tout = p["Conv_0"]["bias"]

    kh1s = s2d_conv_kernel(kh1).astype(dt)
    kh2s = s2d_conv_kernel(kh2).astype(dt)
    kouts = s2d_conv_kernel(kout).astype(dt)

    # 7x7 stem and k4/s2 down stay canonical (k=7 s2d fill is 19%).
    res2 = ResidualBlock(2 * c, dtype=dt)
    res4 = ResidualBlock(4 * c, dtype=dt)
    stem = ConvBlock(c, 7, dtype=dt)
    down1 = ConvBlock(2 * c, 4, stride=2, padding=1, dtype=dt)
    down2 = ConvBlock(4 * c, 4, stride=2, padding=1, dtype=dt)
    up0 = UpBlock(2 * c, dtype=dt)

    if tail_chain:
        from adam_dehaze_tpu.ops.pallas.tail_chain import (
            make_medium_tail_chain,
        )
        tail_fn = make_medium_tail_chain(model, variables, dtype=dt,
                                         interpret=interpret)
    else:
        tail_fn = None

    def apply_fn(x):
        xin = x.astype(dt)
        x2 = space_to_depth(xin)

        f0 = stem.apply(_sub(variables, "ConvBlock_0"), xin, False)
        f0s = space_to_depth(f0)

        e1 = down1.apply(_sub(variables, "ConvBlock_1"), f0, False)
        e1 = res2.apply(_sub(variables, "ResidualBlock_0"), e1, False)
        e1 = res2.apply(_sub(variables, "ResidualBlock_1"), e1, False)

        e2 = down2.apply(_sub(variables, "ConvBlock_2"), e1, False)
        e2 = res4.apply(_sub(variables, "ResidualBlock_2"), e2, False)
        e2 = res4.apply(_sub(variables, "ResidualBlock_3"), e2, False)

        b = res4.apply(_sub(variables, "ResidualBlock_4"), e2, False)
        b = res4.apply(_sub(variables, "ResidualBlock_5"), b, False)

        d1 = up0.apply(_sub(variables, "UpBlock_0"), b, False)
        d1 = res2.apply(_sub(variables, "ResidualBlock_6"), d1, False)
        d1 = jnp.concatenate([d1, e1], axis=-1)          # plain, 128², 4c

        if tail_fn is not None:
            return depth_to_space(
                tail_fn(d1, f0s, x2)).astype(jnp.float32)

        d2 = s2d_up4(d1, kup.astype(dt), shift=tup, relu=True)  # s2d, c
        d2 = _s2d_residual(d2, p, bs, "ResidualBlock_7", c, dt)
        d2 = s2d_concat(d2, f0s, c, c)                   # s2d, 2c

        h = s2d_conv(d2, kh1s, c, k=3, shift=th1, relu=True)
        h = s2d_conv(h, kh2s, c // 2, k=3, shift=th2, relu=True)
        res = s2d_conv(h, kouts, 3, k=3, shift=tout)
        res = jnp.tanh(res)

        out = jnp.clip(x2 + res, 0.0, 1.0)
        return depth_to_space(out).astype(jnp.float32)

    return apply_fn


def make_medium_chain_apply(model, variables, dtype=jnp.bfloat16,
                            interpret: bool = False):
    """Eval-mode serving path for `MediumIntensityDehazeModel`
    (models/branches.py:90-137): canonical stem/down/up/tail stages with the
    lane-aligned residual segments — [RB_0, RB_1] @128²x128, [RB_2..RB_5]
    @64²x256, [RB_6] @128²x128 — fused into one Pallas program each
    (ops/pallas/res_chain.py). RB_7 (c=64 @256²) stays canonical: its lane
    width is below 128. Exact vs model.apply up to compute-dtype rounding.
    """
    from adam_dehaze_tpu.nn.blocks import ConvBlock, ResidualBlock, UpBlock
    from adam_dehaze_tpu.ops.pallas.res_chain import (
        make_res_attn_chain,
        segment_specs,
    )

    p = variables["params"]
    bs = variables["batch_stats"]
    c = model.base_channels
    dt = dtype

    stem = ConvBlock(c, 7, dtype=dt)
    down1 = ConvBlock(2 * c, 4, stride=2, padding=1, dtype=dt)
    down2 = ConvBlock(4 * c, 4, stride=2, padding=1, dtype=dt)
    up0 = UpBlock(2 * c, dtype=dt)
    up1 = UpBlock(c, dtype=dt)
    res1 = ResidualBlock(c, dtype=dt)
    head1 = ConvBlock(c, 3, dtype=dt)
    head2 = ConvBlock(c // 2, 3, dtype=dt)

    chain_e1 = make_res_attn_chain(segment_specs(
        p, bs, ["ResidualBlock_0", "ResidualBlock_1"]), c=2 * c, dtype=dt,
        interpret=interpret)
    chain_e2b = make_res_attn_chain(segment_specs(
        p, bs, ["ResidualBlock_2", "ResidualBlock_3", "ResidualBlock_4",
                "ResidualBlock_5"]), c=4 * c, dtype=dt, interpret=interpret)
    chain_d1 = make_res_attn_chain(segment_specs(
        p, bs, ["ResidualBlock_6"]), c=2 * c, dtype=dt, interpret=interpret)

    def apply_fn(x):
        xin = x.astype(dt)
        f0 = stem.apply(_sub(variables, "ConvBlock_0"), xin, False)
        e1 = down1.apply(_sub(variables, "ConvBlock_1"), f0, False)
        e1 = chain_e1(e1)
        e2 = down2.apply(_sub(variables, "ConvBlock_2"), e1, False)
        b = chain_e2b(e2)
        d1 = up0.apply(_sub(variables, "UpBlock_0"), b, False)
        d1 = chain_d1(d1)
        d1 = jnp.concatenate([d1, e1], axis=-1)
        d2 = up1.apply(_sub(variables, "UpBlock_1"), d1, False)
        d2 = res1.apply(_sub(variables, "ResidualBlock_7"), d2, False)
        d2 = jnp.concatenate([d2, f0], axis=-1)
        h = head1.apply(_sub(variables, "ConvBlock_3"), d2, False)
        h = head2.apply(_sub(variables, "ConvBlock_4"), h, False)
        res = jax.lax.conv_general_dilated(
            h, p["Conv_0"]["kernel"].astype(dt), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        res = jnp.tanh(res + p["Conv_0"]["bias"].astype(dt))
        return jnp.clip(xin + res, 0.0, 1.0).astype(jnp.float32)

    return apply_fn


def make_serving_apply(model, variables, dtype=jnp.bfloat16):
    """Fastest exact eval-mode apply for a branch model: s2d paths for the
    default factory architectures, the canonical flax apply otherwise."""
    from adam_dehaze_tpu.models.branches import (
        HighIntensityDehazeModel,
        LightweightDehazeModel,
        MediumIntensityDehazeModel,
    )

    if isinstance(model, LightweightDehazeModel):
        # On TPU the whole branch runs as ONE fused Pallas program per image
        # (ops/pallas/s2d_chain.py; measured 2x over the 9-conv XLA s2d
        # path). The kernel needs lane width 4*base_channels == 128 and at
        # least one residual block; anything else (and CPU) takes the XLA
        # s2d path.
        if (jax.default_backend() != "cpu"
                and 4 * model.base_channels == 128 and model.n_blocks >= 1):
            from adam_dehaze_tpu.ops.pallas.s2d_chain import (
                make_lightweight_chain_apply,
            )
            return make_lightweight_chain_apply(variables, dtype=dtype)
        return make_lightweight_s2d_apply(variables, dtype=dtype)
    if isinstance(model, MediumIntensityDehazeModel):
        # Measured FAIR ladder on v5e @256²x16, all contenders at bf16
        # (logs/probe_medium_fair.log): canonical 23.45 ms < s2d 25.73 ≈
        # chain-hybrid 25.75. XLA's stacked conv fusion runs the aligned
        # residual segments near peak in-context (see probe_chain_micro),
        # and the c=64 full-res lane padding costs less than either
        # rewrite's overhead. NOTE: an earlier probe compared against a
        # model built at its f32 default and wrongly flipped this to the
        # chain — always compare at the serving dtype. The module is
        # re-cloned at the requested serving dtype so a model left at its
        # f32 default still serves at `dtype` like the other branches.
        m = model if model.dtype == dtype else model.clone(dtype=dtype)
        return lambda x: m.apply(variables, x, train=False)
    if isinstance(model, HighIntensityDehazeModel):
        return make_high_s2d_apply(model, variables, dtype=dtype)
    return lambda x: model.apply(variables, x, train=False)
