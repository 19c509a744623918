"""Fused Pallas s2d tail chain for the high branch's decoder tail.

Scope: everything AFTER the d1 concat of `HighIntensityDehazeModel`'s
serving path (ops/s2d.py:make_high_s2d_apply, reference architecture
high_intensity.py:62-147) as ONE Pallas program per image:

    up4 (sub-pixel ConvTranspose, s2d-native) -> ResidualBlock ->
    CBAM attention (channel MLP + 7x7 spatial stencil, both in s2d) ->
    concat with the stem features -> two head convs -> output conv ->
    tanh -> guidance-gated residual blend with the input.

plus the 3-conv guidance head on the s2d input. The round-3 profile left
these stages as the only ones below ~50% of peak in context (ROUND3.md);
the XLA path runs them as ~10 convolutions with an HBM round-trip between
each, and the CBAM stats conv at 8 input lanes (6% lane fill). Here the
whole tail is VMEM-resident: HBM sees three input reads (d1, stem s2d,
input s2d) and one output write.

Layout (shared with ops/pallas/s2d_chain.py, generalized): activations on
the 128-square s2d grid stored flat as ((H2 + 2R) rows x STRIDE cols,
lanes) with a ring of R=2 zero rows/cols — wide enough for both the
2x2-tap convs (reach 1) and the 7x7 CBAM stencil's s2d form (4x4 taps,
reach 2). STRIDE = round_up(W2 + 2R, 8) keeps every window base and strip
offset provably 8-aligned for Mosaic's dynamic-slice rule.

Each s2d conv is T*T tap matmuls (T=2 for k<=3 and the up4 phases, T=4
for the 7x7 stencil) with column taps as `pltpu.roll`s of the matmul
RESULT (matmul-first: rolls always run at the output lane width >= 128)
and the phase regroup as two rolls + lane-block selects, parameterized by
the conv's pad_lo (1 for k3/up4, 2 for k7). Specific tricks:

- concat-free heads: the 768-lane concat conv splits into two 384-row
  kernel halves applied to the d2 buffer and the stem-feature input
  (kernel rows permuted at build time to match s2d_concat's phase-major
  interleave), summed in the accumulator.
- CBAM channel stats: the phase fold of the mean is absorbed into the
  MLP's first matmul (k0 tiled across the 4 phase blocks); the per-phase
  max uses 4 masked full-lane reductions (no sub-128 lane slicing).
- guidance: the 1x1 output conv's 4 phase gates are expanded to the
  12-lane blend layout INSIDE the kernel matrix (block-diagonal column
  replication), so no per-lane gate shuffling is needed at blend time.

Serving path only (eval mode). Equivalence vs the XLA tail is pinned by
tools/probe_tail.py's decomposition check and tests/test_tail_chain.py.
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
    _fold_convblock,
    depth_to_space,
    s2d_conv_kernel,
    space_to_depth,
)

RING = 2     # zero ring: >= 2 for the 7x7 stencil's s2d taps (reach 2)
GUARD = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _conv_taps(wins, tap_fn, co: int, m_yb: int, t_cols: int):
    """Tap matmuls on flat windows: wins[u] is (m_yb + GUARD, ci); the
    column tap v rolls the (rows, co) matmul RESULT by -v (wrap rows land
    in the guard and are never read). Returns (m_yb, co) f32."""
    acc = jnp.zeros((m_yb, co), jnp.float32)
    for u, win in enumerate(wins):
        for v in range(t_cols):
            y = jnp.dot(win, tap_fn(u * t_cols + v),
                        preferred_element_type=jnp.float32)
            if v == 0:
                acc = acc + y[0:m_yb, :]
            else:
                acc = acc + pltpu.roll(y, y.shape[0] - v, 0)[0:m_yb, :]
    return acc


def _regroup(acc, stride: int, m_out: int, g: int, pad_lo: int):
    """Phase regroup: out[q, blk(a,b)] = acc[q + a*stride + b - pad_lo].
    Wrapped rows from the rolls land at flat columns < pad_lo <= RING,
    which are masked ring columns. Lanes beyond 4*g select the (1,1)
    candidate — garbage the caller ignores."""
    lanes = acc.shape[1]
    r_b0 = pltpu.roll(acc, pad_lo, 0)              # acc[q - pad_lo]
    r_b1 = pltpu.roll(acc, pad_lo - 1, 0) if pad_lo > 1 else acc
    p00 = r_b0[0:m_out, :]
    p01 = r_b1[0:m_out, :]
    p10 = r_b0[stride:stride + m_out, :]
    p11 = r_b1[stride:stride + m_out, :]
    blk = jax.lax.broadcasted_iota(jnp.int32, (m_out, lanes), 1) // g
    return jnp.where(blk == 0, p00,
                     jnp.where(blk == 1, p01,
                               jnp.where(blk == 2, p10, p11)))


def _kernel_helpers(sh_ref, *, h2: int, w2: int, stride: int, strip: int,
                    c4: int):
    """Shared in-kernel machinery for the tail kernels (high and medium
    use identical strip iteration, window loading and conv-layer passes;
    the high kernel adds CBAM/guidance stages on top).

    Returns (strip_loop, load_wins, conv_pass):
    - strip_loop(body): fori_loop over strips, body(r0) with r0 the
      strip's flat row offset before the ring.
    - load_wins(ref, img0, pad_lo, t_rows, lanes=None): T row-windows for
      a strip whose first image row sits at flat offset img0 (a multiple
      of stride); window u starts at img0 - pad_lo*stride + u*stride —
      all stride multiples. Input refs are (1, flat, lanes) blocks,
      scratch is (flat, lanes).
    - conv_pass(...): one conv layer over all strips; co_g = (co_lanes,
      group width); `extra` optionally adds a second (ref, tap_fn2,
      lanes) operand summed into the accumulator (the concat-free head
      conv).
    - mask_for(co): the valid-column boolean mask at exactly `co` lanes.
      Built per width from iota rather than lane-slicing one c4-wide
      mask: Mosaic bitpacks i1 vregs, so extract_strided_slice on a bool
      at a non-{128, full} width asserts in the vector-layout pass
      (limits > packed vreg dim) — the high kernel's head2 (co=256 of
      c4=384) was the crashing case."""
    n_strips = h2 // strip
    m_out = strip * stride
    m_yb = m_out + stride

    def mask_for(co):
        colc = jax.lax.broadcasted_iota(jnp.int32, (m_out, co), 0) % stride
        return jnp.logical_and(colc >= RING, colc < RING + w2)

    def strip_loop(body):
        def wrapped(s, carry):
            body(s * (strip * stride))
            return carry
        jax.lax.fori_loop(0, n_strips, wrapped, 0)

    def load_wins(ref, img0, pad_lo, t_rows, lanes=None):
        lo = slice(0, lanes) if lanes is not None else slice(None)
        if len(ref.shape) == 3:
            return [ref[0, pl.ds(img0 + (u - pad_lo) * stride,
                                 m_yb + GUARD), lo]
                    for u in range(t_rows)]
        return [ref[pl.ds(img0 + (u - pad_lo) * stride, m_yb + GUARD), lo]
                for u in range(t_rows)]

    # img0 of a strip (flat offset of its first image row, incl. ring):
    #   img0 = (RING + s*strip) * stride = r0 + RING*stride
    def conv_pass(src_ref, dst_ref, tap_fn, co_g, shift_row, *, relu,
                  skip=False, pad_lo=1, t_rows=2, t_cols=2,
                  src_lanes=None, extra=None):
        co, g = co_g
        vmask = mask_for(co) if co <= c4 else None

        def body(r0):
            img0 = r0 + RING * stride
            wins = load_wins(src_ref, img0, pad_lo, t_rows, src_lanes)
            acc = _conv_taps(wins, tap_fn, co, m_yb, t_cols)
            if extra is not None:
                ref2, tap2, lanes2 = extra
                wins2 = load_wins(ref2, img0, pad_lo, t_rows, lanes2)
                acc = acc + _conv_taps(wins2, tap2, co, m_yb, t_cols)
            y = _regroup(acc, stride, m_out, g, pad_lo) + sh_ref[
                shift_row:shift_row + 1, :co]
            if skip:
                y = y + dst_ref[pl.ds(img0, m_out),
                                0:co].astype(jnp.float32)
            if relu:
                y = jax.nn.relu(y)
            if vmask is not None:
                y = jnp.where(vmask, y, 0.0)
            dst_ref[pl.ds(img0, m_out), 0:co] = y.astype(dst_ref.dtype)
        strip_loop(body)

    return strip_loop, load_wins, conv_pass, mask_for


def _tail_kernel(d1_ref, f0_ref, x2_ref,
                 kup_ref, kres_ref, kh1a_ref, kh1b_ref, kh2_ref, kout_ref,
                 kg1_ref, kg2_ref, kgo_ref, kst_ref,
                 k0t_ref, k0m_ref, k1_ref, sh_ref,
                 out_ref, a_ref, b_ref, *,
                 h2: int, w2: int, stride: int, strip: int, c4: int,
                 dtype, stages=None):
    """One image through the whole tail. a_ref/b_ref are (flat, c4)
    ping-pong buffers; the stats plane and guidance intermediates reuse
    their dead lane ranges (see the pass comments). `stages` (debug-only,
    a tuple of stage names) compiles a subset of the pipeline — the
    Mosaic-crash bisection hook used by tools/probe_tail_stages.py."""
    on = (lambda s: stages is None or s in stages)
    c = c4 // 4
    m_out = strip * stride
    m_yb = m_out + stride

    strip_loop, load_wins, conv_pass, mask_for = _kernel_helpers(
        sh_ref, h2=h2, w2=w2, stride=stride, strip=strip, c4=c4)

    a_ref[...] = jnp.zeros(a_ref.shape, a_ref.dtype)
    b_ref[...] = jnp.zeros(b_ref.shape, b_ref.dtype)

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (m_out, 128), 1)
    lane_c4 = jax.lax.broadcasted_iota(jnp.int32, (m_out, c4), 1)

    # ---- 1. up4: d1 (plain, c4 lanes) -> d2 (s2d, 4 x c) into A ----
    if on("up"):
        conv_pass(d1_ref, a_ref, lambda t: kup_ref[t], (c4, c), 0,
                  relu=True)

    # ---- 2. residual block: conv_a A->B relu; conv_b B->(+A) relu ----
    if on("res"):
        conv_pass(a_ref, b_ref, lambda t: kres_ref[0, t], (c4, c), 1,
                  relu=True)
        conv_pass(b_ref, a_ref, lambda t: kres_ref[1, t], (c4, c), 2,
                  relu=True, skip=True)

    # ---- 3. CBAM attention on A (s2d domain) ----
    if on("attn_gate"):
        # 3a. channel gate. Ring zeros: the sum divides by the true count and
        # the input is post-ReLU so max against 0 is exact (res_chain.py:139).
        z_all = a_ref[...].astype(jnp.float32)
        s_sum = jnp.sum(z_all, axis=0, keepdims=True)            # (1, c4)
        m_all = jnp.max(z_all, axis=0, keepdims=True)
        # phase fold of the mean is inside k0t (k0 tiled over phase blocks)
        hid_a = jax.nn.relu(jnp.dot(s_sum / float(h2 * w2 * 4), k0t_ref[...],
                                    preferred_element_type=jnp.float32))
        # Per-channel max across the 4 phase blocks. Lane slices at the 96-lane
        # phase boundaries (m_all[:, c:2c] etc.) crash Mosaic's vector-layout
        # pass on-chip (extract_strided_slice limit > vreg dim for misaligned
        # multi-vreg lane offsets), so the cross-lane movement goes through
        # 0/1 selection MATMULS instead: sel_p (c4, 128) extracts phase p's
        # block into lanes 0:c, then the max runs on aligned (1, 128) arrays.
        # Exact: entries are 0/1 and m_all >= 0 (post-ReLU buffer).
        row_i = jax.lax.broadcasted_iota(jnp.int32, (c4, 128), 0)
        col_j = jax.lax.broadcasted_iota(jnp.int32, (c4, 128), 1)
        phase_max = []
        for p in range(4):
            sel = jnp.where(jnp.logical_and(row_i == col_j + p * c, col_j < c),
                            1.0, 0.0)
            phase_max.append(jnp.dot(m_all, sel,
                                     preferred_element_type=jnp.float32))
        m96p = jnp.maximum(jnp.maximum(phase_max[0], phase_max[1]),
                           jnp.maximum(phase_max[2], phase_max[3]))
        hid_m = jax.nn.relu(jnp.dot(m96p, k0m_ref[...],
                                    preferred_element_type=jnp.float32))
        pre = (jnp.dot(hid_a, k1_ref[...], preferred_element_type=jnp.float32)
               + jnp.dot(hid_m, k1_ref[...], preferred_element_type=jnp.float32))
        # Replicate the c-lane gate across the 4 phase blocks with a (128, c4)
        # 0/1 matmul (rep[j, l] = 1 iff l % c == j, zero for j >= c — lanes
        # c:128 of `pre` never contribute) instead of a 96-lane-piece concat,
        # for the same Mosaic alignment reason as above.
        rep_j = jax.lax.broadcasted_iota(jnp.int32, (128, c4), 0)
        rep_l = jax.lax.broadcasted_iota(jnp.int32, (128, c4), 1)
        rep = jnp.where(rep_l % c == rep_j, 1.0, 0.0)
        gc4 = jnp.dot(jax.nn.sigmoid(pre), rep,
                      preferred_element_type=jnp.float32)         # (1, c4)

        # 3b. gated stats pass: A <- A * gc4; stats plane S -> B[:, 0:128]
        # (B's conv_a content is dead). S layout: lane 2p = mean of phase p's
        # channels, lane 2p+1 = max (ops/s2d.py:s2d_attention's stat-fast
        # order). Ring rows of A are zero -> stats 0, reproducing the conv's
        # zero padding exactly.
        def gated_stats_body(r0):
            img0 = r0 + RING * stride
            z = a_ref[pl.ds(img0, m_out), :].astype(jnp.float32) * gc4
            a_ref[pl.ds(img0, m_out), :] = z.astype(dtype)
            stats = jnp.zeros((m_out, 128), jnp.float32)
            for p in range(4):
                blk_mask = jnp.logical_and(lane_c4 >= p * c,
                                           lane_c4 < (p + 1) * c)
                zp = jnp.where(blk_mask, z, 0.0)
                mean_p = jnp.sum(zp, axis=1, keepdims=True) / float(c)
                max_p = jnp.max(jnp.where(blk_mask, z, -jnp.inf), axis=1,
                                keepdims=True)
                max_p = jnp.maximum(max_p, 0.0)   # ring rows: all-masked -> 0
                stats = stats + jnp.where(lane128 == 2 * p, mean_p, 0.0)
                stats = stats + jnp.where(lane128 == 2 * p + 1, max_p, 0.0)
            b_ref[pl.ds(img0, m_out), 0:128] = stats.astype(dtype)
        strip_loop(gated_stats_body)

    if on("attn_spatial"):
        # 3c. spatial 7x7 stencil as an s2d conv (4x4 taps, pad_lo 2) on the
        # stats plane; gate lanes 0..3 map to phase blocks (0,0)(0,1)(1,0)(1,1).
        def spatial_body(r0):
            img0 = r0 + RING * stride
            wins = load_wins(b_ref, img0, 2, 4, 128)
            acc = _conv_taps(wins, lambda t: kst_ref[t], 128, m_yb, 4)
            g4 = jax.nn.sigmoid(_regroup(acc, stride, m_out, 1, 2))
            gsel = jnp.zeros((m_out, c4), jnp.float32)
            for p in range(4):
                gp = g4[:, p:p + 1]
                gsel = gsel + jnp.where(lane_c4 // c == p, gp, 0.0)
            z = a_ref[pl.ds(img0, m_out), :].astype(jnp.float32) * gsel
            a_ref[pl.ds(img0, m_out), :] = z.astype(dtype)
        strip_loop(spatial_body)

    # ---- 4. head conv 1 (concat-free): A (d2) + f0 -> B ----
    if on("head1"):
        conv_pass(a_ref, b_ref, lambda t: kh1a_ref[t], (c4, c), 3,
                  relu=True, extra=(f0_ref, lambda t: kh1b_ref[t], None))

    # ---- 5. head conv 2: B -> A[:, 0:256] (c/2 = 48 -> 192 real lanes,
    # padded to 256 so rolls run at a 128-multiple width) ----
    if on("head2"):
        conv_pass(b_ref, a_ref, lambda t: kh2_ref[t], (256, c // 2), 4,
                  relu=True)

    # ---- 6. guidance head on x2 (input pre-padded to 128 lanes):
    # g1 -> B[:, 0:128], g2 -> A[:, 256:384] (dead lane ranges) ----
    if on("guid"):
        conv_pass(x2_ref, b_ref, lambda t: kg1_ref[t], (128, 16), 5,
                  relu=True, src_lanes=128)

        def g2_body(r0):
            img0 = r0 + RING * stride
            wins = load_wins(b_ref, img0, 1, 2, 128)
            acc = _conv_taps(wins, lambda t: kg2_ref[t], 128, m_yb, 2)
            y = jax.nn.relu(_regroup(acc, stride, m_out, 16, 1)
                            + sh_ref[6:7, :128])
            y = jnp.where(mask_for(128), y, 0.0)
            a_ref[pl.ds(img0, m_out), 256:384] = y.astype(dtype)
        strip_loop(g2_body)

    if on("out"):
        # ---- 7. output conv + tanh + guidance-gated blend, to out_ref ----
        def out_body(r0):
            img0 = r0 + RING * stride
            hwins = load_wins(a_ref, img0, 1, 2, 256)
            acc = _conv_taps(hwins, lambda t: kout_ref[t], 128, m_yb, 2)
            res = jnp.tanh(_regroup(acc, stride, m_out, 3, 1)
                           + sh_ref[7:8, :128])
            # guidance: 1x1 expanded conv (phase gates already replicated x3
            # across the 12 blend lanes inside kgo)
            gsrc = a_ref[pl.ds(img0, m_out), 256:384]
            gpre = jnp.dot(gsrc, kgo_ref[...],
                           preferred_element_type=jnp.float32) + sh_ref[8:9, :128]
            guid = jax.nn.sigmoid(gpre)
            x2v = x2_ref[0, pl.ds(img0, m_out), :].astype(jnp.float32)
            out = jnp.clip(x2v + res * guid, 0.0, 1.0)
            out_ref[0, pl.ds(img0, m_out), :] = out.astype(out_ref.dtype)
        strip_loop(out_body)


def _medium_tail_kernel(d1_ref, f0_ref, x2_ref,
                        kup_ref, kres_ref, kh1a_ref, kh1b_ref, kh2_ref,
                        kout_ref, sh_ref,
                        out_ref, a_ref, b_ref, *,
                        h2: int, w2: int, stride: int, strip: int, c4: int,
                        dtype):
    """Medium-branch tail (models/branches.py:120-137 after the d1 concat):
    up4 -> ResidualBlock_7 -> concat-free heads -> out conv -> tanh ->
    direct residual blend. The high kernel minus CBAM and guidance; at
    c=64 every real lane count is a 128 multiple (c4=256, head2 4*(c/2)
    = 128 exactly, no padded roll widths)."""
    c = c4 // 4
    m_out = strip * stride
    m_yb = m_out + stride

    strip_loop, load_wins, conv_pass, _ = _kernel_helpers(
        sh_ref, h2=h2, w2=w2, stride=stride, strip=strip, c4=c4)

    a_ref[...] = jnp.zeros(a_ref.shape, a_ref.dtype)
    b_ref[...] = jnp.zeros(b_ref.shape, b_ref.dtype)

    # 1. up4: d1 (plain, c4 lanes) -> d2 (s2d, 4 x c) into A
    conv_pass(d1_ref, a_ref, lambda t: kup_ref[t], (c4, c), 0, relu=True)
    # 2. residual block: conv_a A->B relu; conv_b B->(+A) relu
    conv_pass(a_ref, b_ref, lambda t: kres_ref[0, t], (c4, c), 1, relu=True)
    conv_pass(b_ref, a_ref, lambda t: kres_ref[1, t], (c4, c), 2, relu=True,
              skip=True)
    # 3. head conv 1 (concat-free): A (d2) + f0 -> B
    conv_pass(a_ref, b_ref, lambda t: kh1a_ref[t], (c4, c), 3, relu=True,
              extra=(f0_ref, lambda t: kh1b_ref[t], None))
    # 4. head conv 2: B -> A[:, 0:128] (4 * c/2 = 128 real lanes, exact)
    conv_pass(b_ref, a_ref, lambda t: kh2_ref[t], (128, c // 2), 4,
              relu=True)

    # 5. output conv + tanh + direct residual blend, to out_ref
    def out_body(r0):
        img0 = r0 + RING * stride
        hwins = load_wins(a_ref, img0, 1, 2, 128)
        acc = _conv_taps(hwins, lambda t: kout_ref[t], 128, m_yb, 2)
        res = jnp.tanh(_regroup(acc, stride, m_out, 3, 1)
                       + sh_ref[5:6, :128])
        x2v = x2_ref[0, pl.ds(img0, m_out), :].astype(jnp.float32)
        out = jnp.clip(x2v + res, 0.0, 1.0)
        out_ref[0, pl.ds(img0, m_out), :] = out.astype(out_ref.dtype)
    strip_loop(out_body)


@functools.partial(
    jax.jit,
    static_argnames=("h2", "w2", "c4", "interpret", "strip"))
def _run_tail_medium(d1f, f0f, x2f, kup, kres, kh1a, kh1b, kh2, kout,
                     shifts, *, h2, w2, c4, interpret=False, strip=None):
    stride = _round_up(w2 + 2 * RING, 8)
    flat = (h2 + 2 * RING) * stride + GUARD
    n = d1f.shape[0]
    strip = strip or _pick_strip(h2)
    dtype = kup.dtype
    kernel = functools.partial(
        _medium_tail_kernel, h2=h2, w2=w2, stride=stride, strip=strip,
        c4=c4, dtype=dtype)
    img_spec = lambda lanes: pl.BlockSpec(  # noqa: E731
        (1, flat, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_spec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, (lambda i, _s=len(shape): (0,) * _s),
        memory_space=pltpu.VMEM)
    # The output block rides the compute dtype: at batch 16 an f32 out
    # block (9.2 MB/image, double-buffered) pushed the program 392 KB past
    # the 120 MB scoped-VMEM limit; bf16 out keeps it comfortably under
    # and halves the HBM write. apply_fn casts back to f32 outside.
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, flat, 128), dtype),
        grid=(n,),
        in_specs=[
            img_spec(c4), img_spec(c4), img_spec(128),
            w_spec(4, c4, c4),                 # kup
            w_spec(2, 4, c4, c4),              # kres
            w_spec(4, c4, c4),                 # kh1a
            w_spec(4, c4, c4),                 # kh1b
            w_spec(4, c4, 128),                # kh2
            w_spec(4, 128, 128),               # kout
            w_spec(6, c4),                     # shifts
        ],
        out_specs=img_spec(128),
        scratch_shapes=[
            pltpu.VMEM((flat, c4), dtype),
            pltpu.VMEM((flat, c4), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(d1f, f0f, x2f, kup, kres, kh1a, kh1b, kh2, kout, shifts)


def make_medium_tail_chain(model, variables, dtype=jnp.bfloat16,
                           interpret: bool = False,
                           strip: Optional[int] = None):
    """Build fn(d1, f0s, x2) -> blended s2d output (n, h2, w2, 12) f32,
    the fused replacement for the tail of make_medium_s2d_apply
    (ops/s2d.py:672-682): d1 is the plain (n, h2, w2, 4c) decoder state
    after the first up/concat, f0s the s2d stem features, x2 the s2d
    input image. Same math, one Pallas program per image; reference
    architecture medium_intensity.py:60-117."""
    p = variables["params"]
    bs = variables["batch_stats"]
    c = model.base_channels
    c4 = 4 * c
    if (c4 % 128 != 0 or (4 * (c // 2)) % 128 != 0) and not interpret:
        raise ValueError(f"medium tail chain needs lane-aligned widths, "
                         f"got base_channels={c}")

    kup, tup = _fold_up4(p, bs)                              # (4, c4, c4)
    kres, tr = _fold_res_taps(p, bs)                         # (2, 4, c4, c4)

    # heads: ConvBlock_3 consumes the [d2, f0] concat, ConvBlock_4 -> c/2
    kh1a, kh1b, th1 = _fold_head1_split(p, bs, "ConvBlock_3", c, c4)
    kh2_raw, th2 = _fold_convblock(p, bs, "ConvBlock_4")
    kh2 = _taps(s2d_conv_kernel(kh2_raw))                    # (4, c4, 128)
    kout_raw = p["Conv_0"]["kernel"]
    tout = p["Conv_0"]["bias"]
    kouts = s2d_conv_kernel(kout_raw)                        # (2,2, 2c, 12)
    kout = _taps(jnp.pad(kouts, ((0, 0), (0, 0), (0, 0), (0, 128 - 12))))

    row = functools.partial(_shift_row, width=c4)
    shifts = jnp.stack([
        row(tup if tup.shape[0] == c4 else jnp.tile(tup, 4)),
        row(tr[0]), row(tr[1]),
        row(jnp.tile(th1, 4)),
        row(jnp.tile(th2, 4)),                               # 128 real
        row(jnp.tile(tout, 4)),                              # 12 real
    ])

    cast = lambda a: a.astype(dtype)  # noqa: E731
    kup, kres, kh1a, kh1b, kh2, kout = map(
        cast, (kup, kres, kh1a, kh1b, kh2, kout))

    def apply_fn(d1, f0s, x2):
        n, h2, w2, _ = d1.shape
        stride = _round_up(w2 + 2 * RING, 8)
        d1f = _flatten(d1.astype(dtype), h2, w2, stride)
        f0f = _flatten(f0s.astype(dtype), h2, w2, stride)
        x2f = _flatten(x2.astype(dtype), h2, w2, stride, lanes=128)
        out = _run_tail_medium(d1f, f0f, x2f, kup, kres, kh1a, kh1b,
                               kh2, kout, shifts,
                               h2=h2, w2=w2, c4=c4, interpret=interpret,
                               strip=strip).astype(jnp.float32)
        out = out[:, :(h2 + 2 * RING) * stride, :]
        out = out.reshape(n, h2 + 2 * RING, stride, 128)
        return out[:, RING:RING + h2, RING:RING + w2, :12]

    return apply_fn


def _pick_strip(h2: int) -> int:
    for s in (16, 8, 4, 2, 1):
        if h2 % s == 0:
            return s
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("h2", "w2", "c4", "interpret", "strip", "stages"))
def _run_tail(d1f, f0f, x2f, kup, kres, kh1a, kh1b, kh2, kout,
              kg1, kg2, kgo, kst, k0t, k0m, k1, shifts, *,
              h2, w2, c4, interpret=False, strip=None, stages=None):
    stride = _round_up(w2 + 2 * RING, 8)
    flat = (h2 + 2 * RING) * stride + GUARD
    n = d1f.shape[0]
    strip = strip or _pick_strip(h2)
    dtype = kup.dtype
    kernel = functools.partial(
        _tail_kernel, h2=h2, w2=w2, stride=stride, strip=strip, c4=c4,
        dtype=dtype, stages=stages)
    img_spec = lambda lanes: pl.BlockSpec(  # noqa: E731
        (1, flat, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_spec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, (lambda i, _s=len(shape): (0,) * _s),
        memory_space=pltpu.VMEM)
    # The output block rides the compute dtype: at batch 16 an f32 out
    # block (9.2 MB/image, double-buffered) pushed the program 392 KB past
    # the 120 MB scoped-VMEM limit; bf16 out keeps it comfortably under
    # and halves the HBM write. apply_fn casts back to f32 outside.
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, flat, 128), dtype),
        grid=(n,),
        in_specs=[
            img_spec(c4), img_spec(c4), img_spec(128),
            w_spec(4, c4, c4),                 # kup
            w_spec(2, 4, c4, c4),              # kres
            w_spec(4, c4, c4),                 # kh1a
            w_spec(4, c4, c4),                 # kh1b
            w_spec(4, c4, 256),                # kh2
            w_spec(4, 256, 128),               # kout
            w_spec(4, 128, 128),               # kg1
            w_spec(4, 128, 128),               # kg2
            w_spec(128, 128),                  # kgo (1x1 expanded)
            w_spec(16, 128, 128),              # kst (7x7 s2d taps)
            w_spec(c4, 128),                   # k0t
            w_spec(128, 128),                  # k0m
            w_spec(128, 128),                  # k1
            w_spec(9, c4),                     # shifts
        ],
        out_specs=img_spec(128),
        scratch_shapes=[
            pltpu.VMEM((flat, c4), dtype),
            pltpu.VMEM((flat, c4), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(d1f, f0f, x2f, kup, kres, kh1a, kh1b, kh2, kout,
      kg1, kg2, kgo, kst, k0t, k0m, k1, shifts)


def _flatten(x2, h2: int, w2: int, stride: int, lanes: Optional[int] = None):
    """(n, h2, w2, c) s2d tensor -> ring-padded flat (n, flat, c[->lanes])."""
    n, _, _, ch = x2.shape
    xp = jnp.pad(x2, ((0, 0), (RING, RING),
                      (RING, stride - w2 - RING), (0, 0)))
    xp = xp.reshape(n, (h2 + 2 * RING) * stride, ch)
    xp = jnp.pad(xp, ((0, 0), (0, GUARD), (0, 0)))
    if lanes is not None and lanes > ch:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, lanes - ch)))
    return xp


def _taps(k2):
    """(2, 2, ci, co) s2d kernel -> (4, ci, co) tap stack."""
    return k2.reshape(4, k2.shape[2], k2.shape[3])


def _fold_up4(p, bs):
    """Sub-pixel phases of UpBlock_1's ConvTranspose with folded BN
    (ops/s2d.py:s2d_up4); returns (kup (4, c4, c4) tap stack, tup)."""
    kup_raw, tup_ = _fold_bn(p["UpBlock_1"]["ConvTranspose_0"]["kernel"],
                             p["UpBlock_1"]["BatchNorm_0"]["scale"],
                             p["UpBlock_1"]["BatchNorm_0"]["bias"],
                             bs["UpBlock_1"]["BatchNorm_0"]["mean"],
                             bs["UpBlock_1"]["BatchNorm_0"]["var"])
    s_up = (p["UpBlock_1"]["BatchNorm_0"]["scale"]
            / jnp.sqrt(bs["UpBlock_1"]["BatchNorm_0"]["var"] + 1e-5))
    tup = tup_ + s_up * p["UpBlock_1"]["ConvTranspose_0"]["bias"]
    phases = [kup_raw[a::2, b::2] for a in (0, 1) for b in (0, 1)]
    return _taps(jnp.concatenate(phases, axis=-1)), tup


def _fold_res_taps(p, bs, name="ResidualBlock_7"):
    """Residual block's two conv layers as s2d tap stacks; returns
    (kres (2, 4, c4, c4), [shift_a, shift_b])."""
    rsub, rst = p[name], bs[name]
    kr, tr = [], []
    for j in (0, 1):
        k, t = _fold_convblock(rsub, rst, f"ConvBlock_{j}")
        kr.append(_taps(s2d_conv_kernel(k)))
        tr.append(jnp.tile(t, 4))
    return jnp.stack(kr), tr


def _shift_row(vec, width):
    """Bias/BN-shift vector padded to one `width`-lane shift-table row."""
    v = jnp.asarray(vec, jnp.float32).reshape(-1)
    return jnp.pad(v, (0, width - v.shape[0]))


def _fold_head1_split(p, bs, name, c, c4):
    """Head conv consuming the [d2, f0] concat, split into the d2 half and
    the f0 half along the s2d_concat phase-major interleave (rows
    [p*(2c) : p*(2c)+c] are d2 phase p, the next c rows f0 phase p), so
    the kernel needs no in-VMEM concat; returns (kh1a, kh1b, th1)."""
    kh1_raw, th1 = _fold_convblock(p, bs, name)
    kh1s = s2d_conv_kernel(kh1_raw)                          # (2,2, 8c, c4)
    rows = kh1s.reshape(2, 2, 4, 2 * c, c4)
    kh1a = _taps(rows[:, :, :, :c, :].reshape(2, 2, c4, c4))
    kh1b = _taps(rows[:, :, :, c:, :].reshape(2, 2, c4, c4))
    return kh1a, kh1b, th1


def make_high_tail_chain(model, variables, dtype=jnp.bfloat16,
                         interpret: bool = False,
                         strip: Optional[int] = None,
                         stages: Optional[tuple] = None):
    """Build fn(d1, f0s, x2) -> blended s2d output (n, h2, w2, 12) f32,
    the fused replacement for the tail of make_high_s2d_apply
    (ops/s2d.py:577-590): d1 is the plain (n, h2, w2, 4c) decoder state
    after the first up/concat, f0s the s2d stem features, x2 the s2d
    input image. Exact same math, one Pallas program per image."""
    p = variables["params"]
    bs = variables["batch_stats"]
    c = model.base_channels
    c4 = 4 * c
    if c4 % 128 != 0 and not interpret:
        raise ValueError(f"tail chain needs 4*base_channels % 128 == 0, "
                         f"got {c4}")

    kup, tup = _fold_up4(p, bs)                              # (4, c4, c4)
    kres, tr = _fold_res_taps(p, bs)                         # (2, 4, c4, c4)

    # attention params
    ap = p["AttentionBlock_5"]
    k0 = ap["Dense_0"]["kernel"]                             # (c, hidden)
    k1w = ap["Dense_1"]["kernel"]                            # (hidden, c)
    hid = k0.shape[1]
    k0t = jnp.tile(jnp.pad(k0, ((0, 0), (0, 128 - hid))), (4, 1))  # (c4,128)
    k0m = jnp.pad(k0, ((0, 128 - c), (0, 128 - hid)))
    k1p = jnp.pad(k1w, ((0, 128 - hid), (0, 128 - c)))
    kst_raw = s2d_conv_kernel(ap["spatial_conv"])            # (4, 4, 8, 4)
    kst = jnp.pad(kst_raw.reshape(16, 8, 4),
                  ((0, 0), (0, 120), (0, 124)))              # (16, 128, 128)

    # head convs (ConvBlock_5 consumes the [d2, f0] concat)
    kh1a, kh1b, th1 = _fold_head1_split(p, bs, "ConvBlock_5", c, c4)
    kh2_raw, th2 = _fold_convblock(p, bs, "ConvBlock_6")
    kh2s = s2d_conv_kernel(kh2_raw)                          # (2,2, c4, 2c)
    kh2 = _taps(jnp.pad(kh2s, ((0, 0), (0, 0), (0, 0), (0, 256 - 2 * c))))
    kout_raw = p["Conv_1"]["kernel"]
    tout = p["Conv_1"]["bias"]
    kouts = s2d_conv_kernel(kout_raw)                        # (2,2, 2c, 12)
    kout = _taps(jnp.pad(kouts, ((0, 0), (0, 0), (0, 256 - 2 * c),
                                 (0, 128 - 12))))

    # guidance head (3 -> 16 -> 16 -> 1 per phase)
    kg1_raw, tg1 = _fold_convblock(p, bs, "ConvBlock_0")
    kg1s = s2d_conv_kernel(kg1_raw)                          # (2,2, 12, 64)
    kg1 = _taps(jnp.pad(kg1s, ((0, 0), (0, 0), (0, 128 - 12), (0, 64))))
    kg2_raw, tg2 = _fold_convblock(p, bs, "ConvBlock_1")
    kg2s = s2d_conv_kernel(kg2_raw)                          # (2,2, 64, 64)
    kg2 = _taps(jnp.pad(kg2s, ((0, 0), (0, 0), (0, 64), (0, 64))))
    # 1x1 guidance output conv, phase-expanded to the 12 blend lanes:
    # K[p*16 + ch, 3p + t] = w[ch] for t in 0..2
    kgo_s = s2d_conv_kernel(p["Conv_0"]["kernel"])           # (1, 1, 64, 4)
    # jnp (not numpy) so the fold traces when weights arrive as jit
    # arguments (weightless serving bundles, serving_export.py).
    kgo_blockdiag = kgo_s[0, 0].astype(jnp.float32)          # (64, 4)
    kgo = jnp.zeros((128, 128), jnp.float32)
    for pph in range(4):
        for t in range(3):
            kgo = kgo.at[0:64, 3 * pph + t].set(kgo_blockdiag[:, pph])
    tgo = p["Conv_0"]["bias"]                                # (1,)

    # shift table (9, c4) f32: [up, res_a, res_b, h1, h2(256-lane row,
    # stored padded), g1, g2, out, guidance]
    row = functools.partial(_shift_row, width=c4)
    shifts = jnp.stack([
        row(tup if tup.shape[0] == c4 else jnp.tile(tup, 4)),
        row(tr[0]), row(tr[1]),
        row(jnp.tile(th1, 4)),
        row(jnp.tile(th2, 4)),                               # 192 real
        row(jnp.tile(tg1, 4)),                               # 64 real
        row(jnp.tile(tg2, 4)),
        row(jnp.tile(tout, 4)),                              # 12 real
        row(jnp.tile(tgo, 12)),                              # 12 real
    ])

    cast = lambda a: a.astype(dtype)  # noqa: E731
    kup, kres, kh1a, kh1b, kh2, kout, kg1, kg2, kst = map(
        cast, (kup, kres, kh1a, kh1b, kh2, kout, kg1, kg2, kst))
    k0t = k0t.astype(jnp.float32)
    k0m = k0m.astype(jnp.float32)
    k1p = k1p.astype(jnp.float32)
    kgo = kgo.astype(jnp.float32)

    def apply_fn(d1, f0s, x2):
        n, h2, w2, _ = d1.shape
        stride = _round_up(w2 + 2 * RING, 8)
        d1f = _flatten(d1.astype(dtype), h2, w2, stride)
        f0f = _flatten(f0s.astype(dtype), h2, w2, stride)
        x2f = _flatten(x2.astype(dtype), h2, w2, stride, lanes=128)
        out = _run_tail(d1f, f0f, x2f, kup, kres, kh1a, kh1b, kh2, kout,
                        kg1, kg2, kgo, kst, k0t, k0m, k1p, shifts,
                        h2=h2, w2=w2, c4=c4, interpret=interpret,
                        strip=strip, stages=stages).astype(jnp.float32)
        out = out[:, :(h2 + 2 * RING) * stride, :]
        out = out.reshape(n, h2 + 2 * RING, stride, 128)
        return out[:, RING:RING + h2, RING:RING + w2, :12]

    return apply_fn
