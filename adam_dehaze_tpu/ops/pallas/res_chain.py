"""Fused Pallas chain for aligned residual/CBAM stages (plain NHWC domain).

Why: after the s2d rewrites, the serving-time profile of the medium/high
branches is dominated by their lane-ALIGNED inner stages — stacks of
3x3 ResidualBlocks and CBAM AttentionBlocks at 64²x384 / 128²x192 etc.
(benchmarks/profile_branches.json: res4@64² runs at 70 TF/s, res2@128² at
61, each as 2 XLA convs with an HBM round-trip between every op). This
kernel runs a whole same-shape segment — e.g. the high branch's
[res, res, attn, res, attn, res, attn] encoder+bottleneck at 64² — as ONE
Pallas program per image: the activation stays VMEM-resident across the
segment, HBM sees one read and one write.

Layout: the activation (H, W, C) is stored flat as ((H + 2R) rows x STRIDE
cols, lanes=C) with a ring of R=4 zero rows/cols — wide enough for BOTH the
3x3 convs (needs 1) and CBAM's 7x7 spatial stencil (needs 3). STRIDE =
round_up(W + 2R, 8), so every strip base and tap-row window starts at an
8-aligned flat offset (Mosaic's provably-%8 dynamic-slice rule; see
ops/pallas/s2d_chain.py for the discipline).

Each 3x3 conv is 9 tap matmuls on the flat layout:

    acc[q] = sum_{u,v in {-1,0,1}} flat[q + u*STRIDE + v] @ K[u+1, v+1]

Row taps (u) are aligned window loads at r0 + (R+u)*STRIDE; column taps (v)
roll the (rows, C) matmul RESULT by -v (matmul-first: rolls always run at
the C>=128 lane width; rolling the input instead would need unaligned
slices). BatchNorm is folded into the taps at build time; ReLUs and the
residual skips run in the same VMEM pass.

CBAM attention (nn/blocks.py:80-120 semantics, eval mode) runs fully
in-kernel:
  1. channel gate: global sum/max reductions over the flat buffer (the zero
     ring is harmless: sums divide by the true H*W and the inputs are
     post-ReLU, so max against 0 is exact), shared 2-layer MLP (hidden dim
     zero-padded to 128 lanes), sigmoid;
  2. the gated activation's per-position channel mean/max are broadcast to
     128-lane f32 planes and the 7x7 stencil is 49 roll+FMA steps per
     plane — the roll wrap lands in the R=4 ring rows, which hold zeros,
     reproducing the conv's zero padding exactly;
  3. spatial sigmoid gate multiplies the buffer in place.

Serving path only (eval mode). Reference architecture: the ResidualBlock /
AttentionBlock stacks of high_intensity.py:6-147 and medium_intensity.py:
5-117 (via models/branches.py).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adam_dehaze_tpu.ops.s2d import _fold_bn

RING = 4  # zero-ring rows/cols: >= 3 for the 7x7 CBAM stencil, 8-friendly


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _conv3(src_ref, r0, tap_fn, m_out: int, stride: int, c: int):
    """One 3x3 conv on a strip of the flat buffer: 3 aligned window loads,
    9 matmuls, column taps as rolls of the matmul result. Returns
    (m_out, c) f32 rows for output flat base r0 + RING*stride."""
    guard = 8
    acc = jnp.zeros((m_out, c), jnp.float32)
    for u in (-1, 0, 1):
        win = src_ref[pl.ds(r0 + (RING + u) * stride, m_out + guard), :]
        for v in (-1, 0, 1):
            y = jnp.dot(win, tap_fn((u + 1) * 3 + (v + 1)),
                        preferred_element_type=jnp.float32)
            if v == 0:
                acc = acc + y[0:m_out, :]
            elif v == 1:
                # acc[q] += y[q + 1]
                acc = acc + pltpu.roll(y, y.shape[0] - 1, 0)[0:m_out, :]
            else:
                # acc[q] += y[q - 1]; the wrapped row 0 lands in a masked
                # ring column.
                acc = acc + pltpu.roll(y, 1, 0)[0:m_out, :]
    return acc


def _chain_kernel(x_ref, kconv_ref, shift_ref, k0_ref, k1_ref, wsp_ref,
                  out_ref, a_ref, b_ref, *, layers: Tuple[str, ...], h: int,
                  w: int, stride: int, strip: int, c: int, dtype):
    """One image through the whole segment. a_ref/b_ref hold the flat
    zero-ring activation; res convs ping-pong, attention runs in place on
    b_ref."""
    n_strips = h // strip
    m_out = strip * stride
    flat = a_ref.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (m_out, c), 0) % stride
    valid = jnp.logical_and(col >= RING, col < RING + w)

    a_ref[...] = jnp.zeros(a_ref.shape, a_ref.dtype)
    b_ref[...] = jnp.zeros(b_ref.shape, b_ref.dtype)

    def strip_loop(body):
        def wrapped(s, carry):
            body(s * (strip * stride))
            return carry
        jax.lax.fori_loop(0, n_strips, wrapped, 0)

    # Copy the image into the ring layout of B (input arrives ring-padded).
    def copy_body(r0):
        b_ref[pl.ds(r0 + RING * stride, m_out), :] = (
            x_ref[0, pl.ds(r0 + RING * stride, m_out), :])
    strip_loop(copy_body)

    def conv_layer(src_ref, dst_ref, idx: int, relu: bool, skip: bool):
        def body(r0):
            acc = _conv3(src_ref, r0, lambda t: kconv_ref[idx, t], m_out,
                         stride, c)
            y = acc + shift_ref[idx:idx + 1, :]
            out_base = r0 + RING * stride
            if skip:
                y = y + dst_ref[pl.ds(out_base, m_out), :].astype(jnp.float32)
            if relu:
                y = jax.nn.relu(y)
            y = jnp.where(valid, y, 0.0)
            dst_ref[pl.ds(out_base, m_out), :] = y.astype(dtype)
        strip_loop(body)

    conv_i = 0
    attn_i = 0
    for kind in layers:
        if kind == "res":
            # conv_a: B -> A (relu); conv_b: A -> B with +skip (old B), relu.
            conv_layer(b_ref, a_ref, conv_i, True, False)
            conv_layer(a_ref, b_ref, conv_i + 1, True, True)
            conv_i += 2
        else:  # attn — whole-buffer ops (the flat image fits VMEM)
            z = b_ref[...]
            # Channel gate. Ring zeros: sum is exact (divide by true H*W),
            # max is exact because the input is post-ReLU (>= 0).
            s_c = jnp.sum(z.astype(jnp.float32), axis=0, keepdims=True)
            s_c = s_c / float(h * w)
            m_c = jnp.max(z.astype(jnp.float32), axis=0, keepdims=True)

            def mlp(v):
                hdn = jax.nn.relu(jnp.dot(v, k0_ref[attn_i],
                                          preferred_element_type=jnp.float32))
                return jnp.dot(hdn, k1_ref[attn_i],
                               preferred_element_type=jnp.float32)

            cgate = jax.nn.sigmoid(mlp(s_c) + mlp(m_c))      # (1, c)
            zp = (z.astype(jnp.float32) * cgate)

            # Spatial stats, broadcast to 128-lane f32 planes.
            mean_c = jnp.mean(zp, axis=1, keepdims=True)     # (flat, 1)
            max_c = jnp.max(zp, axis=1, keepdims=True)
            sm = jnp.broadcast_to(mean_c, (flat, 128))
            sx = jnp.broadcast_to(max_c, (flat, 128))

            # 7x7 stencil: gate_pre[q] = sum_t wm[t]*sm[q+off_t]
            #                          + wx[t]*sx[q+off_t].
            # roll(p, s)[q] = p[q-s]  =>  s = -off mod flat. Wrapped rows
            # land in the zero ring (R=4 >= 3 stencil reach).
            gate_pre = jnp.zeros((flat, 128), jnp.float32)
            for t in range(49):
                u, v = t // 7 - 3, t % 7 - 3
                off = u * stride + v
                sh = (-off) % flat
                gate_pre = gate_pre + (wsp_ref[attn_i, t, 0]
                                       * pltpu.roll(sm, sh, 0)
                                       + wsp_ref[attn_i, t, 1]
                                       * pltpu.roll(sx, sh, 0))
            sgate = jax.nn.sigmoid(gate_pre[:, 0:1])         # (flat, 1)
            b_ref[...] = (zp * sgate).astype(dtype)
            attn_i += 1

    def out_body(r0):
        out_ref[0, pl.ds(r0 + RING * stride, m_out), :] = (
            b_ref[pl.ds(r0 + RING * stride, m_out), :])
    strip_loop(out_body)


def _pick_strip(h: int) -> int:
    for s in (32, 16, 8, 4, 2, 1):
        if h % s == 0:
            return s
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("layers", "h", "w", "c", "interpret", "strip"))
def _run_chain(xp, kconv, shifts, k0, k1, wsp, *, layers, h, w, c,
               interpret=False, strip=None):
    stride = _round_up(w + 2 * RING, 8)
    flat = (h + 2 * RING) * stride + 8
    n = xp.shape[0]
    strip = strip or _pick_strip(h)
    dtype = kconv.dtype
    n_conv = kconv.shape[0]
    n_attn = max(k0.shape[0], 1)
    kernel = functools.partial(
        _chain_kernel, layers=tuple(layers), h=h, w=w, stride=stride,
        strip=strip, c=c, dtype=dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, flat, c), dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, flat, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_conv, 9, c, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_conv, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_attn, c, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_attn, 128, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_attn, 49, 2), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, flat, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((flat, c), dtype),
            pltpu.VMEM((flat, c), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, kconv, shifts, k0, k1, wsp)


def make_res_attn_chain(layer_specs: Sequence[Tuple[str, dict, dict]],
                        c: int, dtype=jnp.bfloat16,
                        interpret: bool = False,
                        strip: Optional[int] = None):
    """Build a fused serving fn for a same-shape segment.

    layer_specs: sequence of ("res", params, batch_stats) — a ResidualBlock's
    subtrees — or ("attn", params, None) — an AttentionBlock's params.
    Returns fn(x: (n, h, w, c) NHWC) == the sequential canonical applies in
    eval mode, up to compute-dtype rounding (tests/test_res_chain.py).
    """
    conv_taps: List[jax.Array] = []
    conv_shifts: List[jax.Array] = []
    k0s: List[jax.Array] = []
    k1s: List[jax.Array] = []
    wsps: List[jax.Array] = []
    layers: List[str] = []

    for kind, p, bs in layer_specs:
        if kind == "res":
            for j in (0, 1):
                blk = p[f"ConvBlock_{j}"]
                st = bs[f"ConvBlock_{j}"]
                k, t = _fold_bn(blk["Conv_0"]["kernel"],
                                blk["BatchNorm_0"]["scale"],
                                blk["BatchNorm_0"]["bias"],
                                st["BatchNorm_0"]["mean"],
                                st["BatchNorm_0"]["var"])
                # (3, 3, c, c) -> (9, c, c) tap matrices
                conv_taps.append(k.reshape(9, c, c))
                conv_shifts.append(t)
            layers.append("res")
        elif kind == "attn":
            k0 = p["Dense_0"]["kernel"]            # (c, hidden)
            k1 = p["Dense_1"]["kernel"]            # (hidden, c)
            hid = k0.shape[1]
            k0s.append(jnp.pad(k0, ((0, 0), (0, 128 - hid))))
            k1s.append(jnp.pad(k1, ((0, 128 - hid), (0, 0))))
            wsps.append(p["spatial_conv"].reshape(49, 2))
            layers.append("attn")
        else:
            raise ValueError(f"unknown layer kind {kind!r}")

    if not conv_taps:
        raise ValueError("chain needs at least one res block")
    if layers[0] == "attn":
        # The in-kernel channel max reads the zero ring, which is exact
        # only for non-negative inputs — guaranteed after a ReLU-terminated
        # res block, not for the segment's raw input.
        raise ValueError("chain segments must start with a res block: the "
                         "attn channel-max assumes post-ReLU (>=0) input")
    kconv = jnp.stack(conv_taps).astype(dtype)
    shifts = jnp.stack(conv_shifts).astype(jnp.float32)
    if k0s:
        k0 = jnp.stack(k0s).astype(jnp.float32)
        k1 = jnp.stack(k1s).astype(jnp.float32)
        wsp = jnp.stack(wsps).astype(jnp.float32)
    else:
        k0 = jnp.zeros((1, c, 128), jnp.float32)
        k1 = jnp.zeros((1, 128, c), jnp.float32)
        wsp = jnp.zeros((1, 49, 2), jnp.float32)

    def apply_fn(x):
        n, h, w, _ = x.shape
        stride = _round_up(w + 2 * RING, 8)
        xp = jnp.pad(x, ((0, 0), (RING, RING),
                         (RING, stride - w - RING), (0, 0)))
        xp = xp.reshape(n, (h + 2 * RING) * stride, c)
        xp = jnp.pad(xp, ((0, 0), (0, 8), (0, 0))).astype(dtype)
        out = _run_chain(xp, kconv, shifts, k0, k1, wsp,
                         layers=tuple(layers), h=h, w=w, c=c,
                         interpret=interpret, strip=strip)
        out = out[:, :(h + 2 * RING) * stride, :]
        out = out.reshape(n, h + 2 * RING, stride, c)
        return out[:, RING:RING + h, RING:RING + w, :]

    return apply_fn


def segment_specs(p, bs, names: Sequence[str]):
    """Helper: build layer_specs from a branch's variables by module name
    (e.g. ["ResidualBlock_2", "ResidualBlock_3", "AttentionBlock_1"])."""
    specs = []
    for nm in names:
        if nm.startswith("Res"):
            specs.append(("res", p[nm], bs[nm]))
        else:
            specs.append(("attn", p[nm], None))
    return specs
