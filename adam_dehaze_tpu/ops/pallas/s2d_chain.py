"""Fused Pallas s2d-conv chain for the low branch (LightweightDehazeModel).

Why: the XLA s2d serving path (ops/s2d.py:make_lightweight_s2d_apply) runs
the 9 lane-aligned convs as 9 separate XLA convolutions; measured in-program
time is ~7 ms per 16-image bucket vs ~3.3 ms at the per-op ceilings — the
residue is pure per-conv overhead (dispatch, HBM round-trips between convs)
at these shapes (benchmarks/PROFILE.md, round-2 floor analysis). This kernel
runs the WHOLE branch as one Pallas program per image: the activation stays
VMEM-resident between layers, HBM sees one input read and one output write.

Layout: the s2d activation (H2, W2, 4C) is stored flat as (H2+2 rows x
STRIDE cols, lanes=4C) where STRIDE = round_up(W2 + 2, 8) — one zero-padding
ring for the convs plus alignment columns. With an 8-aligned row stride,
every window the kernel reads starts at an 8-multiple flat offset, so Mosaic
never needs a misaligned dynamic sublane slice; the +1 tap/phase shifts
happen as STATIC in-register slices of loaded values (the aligned-window +
static-slice discipline from ops/pallas/cbam.py).

Each s2d conv (derived in ops/s2d.py:s2d_conv_kernel; exact, not an
approximation) is 4 tap matmuls on the flat layout:

    yb[t] = sum_{u,v in {0,1}} flat[t + u*STRIDE + v] @ K[u,v]
    out[q, ch_block(a,b)] = yb[q + a*STRIDE + b - 1, ch_block(a,b)]

i.e. contraction over lanes on the MXU, taps and the phase regroup as flat
shifts. BatchNorm is folded into (tap scale, shift) at build time; bias adds,
ReLUs, the residual skips, the output sigmoid and the skip_alpha blend all
run in the same VMEM pass. The chain pays the s2d MAC waste (16/9 dense
slots) but keeps every matmul at lane width 4C=128 and never leaves VMEM.

Serving path only (eval mode, like all of ops/s2d.py). Reference
architecture: low_intensity.py:5-54 (LightweightDehazeModel).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adam_dehaze_tpu.ops.s2d import (
    _fold_bn,
    depth_to_space,
    s2d_conv_kernel,
    space_to_depth,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _conv_taps(acc_dtype, win0, win1, tap_fn, co, m):
    """One s2d conv on a flat strip: 4 tap matmuls, f32 accumulation.

    win0/win1: (m + GUARD, ci) windows starting at rows r and r + STRIDE of
    the source buffer. Matmul-first formulation: the +1 column tap is a
    single `pltpu.roll` of the (m + GUARD, co) matmul RESULT, not of the
    window — the roll then always runs at the co lane width (128 here;
    sub-128 `tpu.dynamic_rotate` is unimplemented in Mosaic and the s2d
    input window is ci=12), and a static unaligned value slice instead
    would make Mosaic emit per-vreg shuffle code that explodes lowering to
    minutes. Row shifts commute with the matmul because the contraction is
    over lanes only. The wrapped row lands beyond m (GUARD >= 1) and is
    never read. tap_fn(t) returns the 2D (ci, co) tap matrix for
    t = u*2 + v (a direct 2D ref read — Mosaic only lowers 2D gathers).
    Returns (m, co) f32.
    """
    acc = jnp.zeros((m, co), acc_dtype)
    for u, win in ((0, win0), (1, win1)):
        acc = acc + jnp.dot(win[0:m, :], tap_fn(u * 2),
                            preferred_element_type=acc_dtype)
        y1 = jnp.dot(win, tap_fn(u * 2 + 1), preferred_element_type=acc_dtype)
        # shifted[j] = y1[j + 1]; pltpu.roll wants a non-negative shift, so
        # roll by len-1 (circularly identical to -1).
        acc = acc + pltpu.roll(y1, y1.shape[0] - 1, 0)[0:m, :]
    return acc


def _regroup(acc, stride: int, m_out: int, g: int):
    """Phase regroup: out[q, blk(a,b)] = yb[q + a*stride + b - 1, blk(a,b)].

    acc: (m_yb = m_out + stride [+pad], lanes) f32 yb strip with channel
    groups of width g (lanes may exceed 4*g when the logical co is padded
    to 128 — lanes >= 4*g get the p11 candidate, garbage the caller slices
    off). One `pltpu.roll` gives the b=0 groups' -1 offset
    (accr[q] = acc[q-1]); the a=1 groups read at +stride, an aligned slice.
    The four full-width candidates are merged with lane-index selects —
    elementwise ops, no unaligned slices, no per-vreg shuffle explosions.
    The rolled row 0 wraps garbage into q=0, which is a masked border
    column."""
    lanes = acc.shape[1]
    accr = pltpu.roll(acc, 1, 0)  # accr[q] = acc[q - 1]
    p00 = accr[0:m_out, :]
    p01 = acc[0:m_out, :]
    p10 = accr[stride:stride + m_out, :]
    p11 = acc[stride:stride + m_out, :]
    blk = jax.lax.broadcasted_iota(jnp.int32, (m_out, lanes), 1) // g
    return jnp.where(blk == 0, p00,
                     jnp.where(blk == 1, p01,
                               jnp.where(blk == 2, p10, p11)))


def _lightweight_kernel(xp_ref, kin_ref, kres_ref, kmid_ref, kout_ref,
                        sh_ref, alpha_ref, out_ref, a_ref, b_ref, *,
                        h2: int, w2: int, stride: int, strip: int,
                        n_res: int, c4: int, dtype):
    """One image through the whole branch. Buffers a_ref/b_ref hold the
    zero-padded flat activation; layers ping-pong between them with the
    residual adds done in place."""
    n_strips = h2 // strip
    guard = 8
    m_yb = (strip + 1) * stride      # yb rows per strip (strip+1 rows)
    m_out = strip * stride           # output rows per strip

    # Border-column mask for intermediate stores (cols 0 and w2+1..stride-1
    # act as conv zero padding and must stay zero).
    col = jax.lax.broadcasted_iota(jnp.int32, (m_out, c4), 0) % stride
    valid = jnp.logical_and(col >= 1, col <= w2)

    a_ref[...] = jnp.zeros(a_ref.shape, a_ref.dtype)
    b_ref[...] = jnp.zeros(b_ref.shape, b_ref.dtype)

    # Per-strip loops run as lax.fori_loop: the strip base r0 = s *
    # (strip*stride) is a dynamic sublane offset, but strip*stride is a
    # static multiple of 8 (stride is 8-aligned), so Mosaic's
    # provably-%8 dynamic-slice rule holds. Unrolling instead multiplies
    # the Mosaic lowering time by n_strips (~minutes per program).
    def strip_loop(body):
        def wrapped(s, carry):
            body(s * (strip * stride))
            return carry
        jax.lax.fori_loop(0, n_strips, wrapped, 0)

    def load_windows(src_ref, r0):
        w0 = src_ref[pl.ds(r0, m_yb + guard), :]
        w1 = src_ref[pl.ds(r0 + stride, m_yb + guard), :]
        return w0, w1

    def layer(src_ref, dst_ref, tap_fn, co, shift, relu, skip: bool):
        def body(r0):
            w0, w1 = load_windows(src_ref, r0)
            acc = _conv_taps(jnp.float32, w0, w1, tap_fn, co, m_yb)
            y = _regroup(acc, stride, m_out, co // 4) + shift[0:1, :co]
            out_base = r0 + stride
            if skip:
                y = y + dst_ref[pl.ds(out_base, m_out), :].astype(jnp.float32)
            if relu:
                y = jax.nn.relu(y)
            y = jnp.where(valid[:, :co], y, 0.0)
            dst_ref[pl.ds(out_base, m_out), :] = y.astype(dtype)
        strip_loop(body)

    # Input layer: s2d image (12 lanes) -> c4, writes B.
    ci_in = xp_ref.shape[-1]

    def in_body(r0):
        w0 = xp_ref[0, pl.ds(r0, m_yb + guard), :]
        w1 = xp_ref[0, pl.ds(r0 + stride, m_yb + guard), :]
        acc = _conv_taps(jnp.float32, w0, w1, lambda t: kin_ref[t], c4, m_yb)
        y = jax.nn.relu(_regroup(acc, stride, m_out, c4 // 4) + sh_ref[0:1, :])
        y = jnp.where(valid, y, 0.0)
        b_ref[pl.ds(r0 + stride, m_out), :] = y.astype(dtype)
    strip_loop(in_body)

    # Residual blocks: conv_a B->A (relu), conv_b A->(+B, relu) in place.
    for r in range(n_res):
        layer(b_ref, a_ref, lambda t, rr=2 * r: kres_ref[rr, t], c4,
              sh_ref[1 + 2 * r:2 + 2 * r, :], True, False)
        layer(a_ref, b_ref, lambda t, rr=2 * r + 1: kres_ref[rr, t], c4,
              sh_ref[2 + 2 * r:3 + 2 * r, :], True, True)

    # Mid conv B->A (relu).
    layer(b_ref, a_ref, lambda t: kmid_ref[t], c4,
          sh_ref[1 + 2 * n_res:2 + 2 * n_res, :], True, False)

    # Output conv + sigmoid + skip_alpha blend, straight to out_ref. kout
    # is zero-padded to c4 output lanes at build time so every matmul and
    # roll runs at 128 lanes; the regroup keeps the REAL group width
    # (ci_in // 4) and the pad lanes are sliced off before the store.
    alpha = alpha_ref[0, 0]

    def out_body(r0):
        w0, w1 = load_windows(a_ref, r0)
        acc = _conv_taps(jnp.float32, w0, w1, lambda t: kout_ref[t], c4,
                         m_yb)
        y = (_regroup(acc, stride, m_out, ci_in // 4)
             + sh_ref[2 + 2 * n_res:3 + 2 * n_res, :])[:, :ci_in]
        y = jax.nn.sigmoid(y)
        out_base = r0 + stride
        x2 = xp_ref[0, pl.ds(out_base, m_out), :].astype(jnp.float32)
        out_ref[0, pl.ds(out_base, m_out), :] = (1.0 - alpha) * x2 + alpha * y
    strip_loop(out_body)


def _pick_strip(h2: int) -> int:
    """Measured on v5e @ 256² (batch 16): strip 32 → 4.47 ms and ~40 s
    remote compile; strip 16 → 4.53 ms but ~6 min compile; strip 64 →
    9.1 ms (VMEM working-set spills). Prefer 32."""
    for s in (32, 16, 8, 4, 2, 1):
        if h2 % s == 0:
            return s
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("h2", "w2", "n_res", "c4", "interpret", "strip"))
def _run_chain(xp, kin, kres, kmid, kout, shifts, alpha, *, h2, w2, n_res,
               c4, interpret=False, strip=None):
    stride = _round_up(w2 + 2, 8)
    flat = (h2 + 2) * stride + 8
    n = xp.shape[0]
    ci_in = xp.shape[-1]
    strip = strip or _pick_strip(h2)
    dtype = kin.dtype
    kernel = functools.partial(
        _lightweight_kernel, h2=h2, w2=w2, stride=stride, strip=strip,
        n_res=n_res, c4=c4, dtype=dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, flat, ci_in), jnp.float32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, flat, ci_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, ci_in, c4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n_res, 4, c4, c4), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c4, c4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c4, c4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n_res + 3, c4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, flat, ci_in), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((flat, c4), dtype),
            pltpu.VMEM((flat, c4), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, kin, kres, kmid, kout, shifts, alpha)


def make_lightweight_chain_apply(variables, dtype=jnp.bfloat16,
                                 interpret: bool = False,
                                 strip: Optional[int] = None):
    """Exact eval-mode serving fn for `LightweightDehazeModel`
    (models/branches.py:32-55) as ONE fused Pallas program per image.

    Same contract as ops/s2d.py:make_lightweight_s2d_apply (whose BN-folding
    and kernel-transform algebra this reuses): fn(x) == model.apply(
    variables, x, train=False) up to compute-dtype rounding. Regression
    tested in tests/test_pallas_kernels.py.
    """
    p = variables["params"]
    bs = variables["batch_stats"]

    def fold(block_p, block_s):
        k = block_p["Conv_0"]["kernel"]
        bn = block_p["BatchNorm_0"]
        st = block_s["BatchNorm_0"]
        return _fold_bn(k, bn["scale"], bn["bias"], st["mean"], st["var"])

    def taps(kernel):
        k2 = s2d_conv_kernel(kernel)  # (2, 2, 4ci, 4co)
        return k2.reshape(4, k2.shape[2], k2.shape[3]).astype(dtype)

    k_in, t_in = fold(p["ConvBlock_0"], bs["ConvBlock_0"])
    c = t_in.shape[0]
    c4 = 4 * c
    res_taps, res_shifts = [], []
    n_res = 0
    while f"ResidualBlock_{n_res}" in p:
        rp = p[f"ResidualBlock_{n_res}"]
        rs = bs[f"ResidualBlock_{n_res}"]
        for j in (0, 1):
            k, t = fold(rp[f"ConvBlock_{j}"], rs[f"ConvBlock_{j}"])
            res_taps.append(taps(k))
            res_shifts.append(jnp.tile(t, 4))
        n_res += 1
    k_mid, t_mid = fold(p["ConvBlock_1"], bs["ConvBlock_1"])
    k_out = p["Conv_0"]["kernel"]
    t_out = p["Conv_0"]["bias"]
    alpha = jnp.asarray(p["skip_alpha"], jnp.float32).reshape(1, 1)

    if n_res == 0:
        raise ValueError("chain kernel expects >= 1 residual block")
    kin = taps(k_in)
    kres = jnp.stack(res_taps)
    kmid = taps(k_mid)
    kout = taps(k_out)
    ci_in = kin.shape[1]
    # Pad the output conv to c4 lanes so its matmuls/rolls run at full lane
    # width in the kernel (sub-128 rotates are unimplemented in Mosaic).
    kout = jnp.pad(kout, ((0, 0), (0, 0), (0, c4 - kout.shape[2])))
    shift_rows = [jnp.tile(t_in, 4)] + res_shifts + [jnp.tile(t_mid, 4)]
    shift_rows.append(jnp.pad(jnp.tile(t_out, 4), (0, c4 - 4 * t_out.shape[0])))
    shifts = jnp.stack(shift_rows).astype(jnp.float32)

    def apply_fn(x):
        n, h, w, _ = x.shape
        h2, w2 = h // 2, w // 2
        stride = _round_up(w2 + 2, 8)
        x2 = space_to_depth(x)
        xp = jnp.pad(x2, ((0, 0), (1, 1), (1, stride - w2 - 1), (0, 0)))
        xp = xp.reshape(n, (h2 + 2) * stride, ci_in)
        xp = jnp.pad(xp, ((0, 0), (0, 8), (0, 0))).astype(dtype)
        out = _run_chain(xp, kin, kres, kmid, kout, shifts, alpha,
                         h2=h2, w2=w2, n_res=n_res, c4=c4,
                         interpret=interpret, strip=strip)
        out = out[:, :(h2 + 2) * stride, :].reshape(n, h2 + 2, stride, ci_in)
        out = out[:, 1:1 + h2, 1:1 + w2, :]
        return depth_to_space(out).astype(jnp.float32)

    return apply_fn
