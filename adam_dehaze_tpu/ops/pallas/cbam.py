"""Fused CBAM spatial-attention gate as a Pallas TPU kernel.

The spatial gate of the reference AttentionBlock
(reference: models/dehazing/base_model.py:72-78) is

    stats = [mean_c(x), max_c(x)]          # (B, H, W, 2)
    gate  = sigmoid(conv7x7(stats))        # zero padding 3
    out   = x * gate

The channel reduction is one cheap fused XLA pass; the expensive part is the
7x7 stencil + sigmoid + full-tensor multiply, which naively costs an extra
read+write of x-sized HBM traffic. This kernel fuses stencil, sigmoid and
multiply in VMEM: per (image, H-tile) grid step it reads the x tile once and
writes the gated tile once. The (mean, max) maps are pre-padded by the halo
(3 px) and fed as whole-image blocks whose index depends only on the batch
coordinate, so Pallas keeps them resident in VMEM across the H-tiles of the
same image.

Alignment note: a first version DMA'd x manually (HBM->VMEM via
make_async_copy), but Mosaic requires the last dim of manual DMA slices to be
128-aligned and the attention channels here are 96/192/384. BlockSpec
auto-pipelining handles the unaligned channel dim by padding, hence this
design.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 3  # (7 - 1) // 2


_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the 16 MB scoped limit


def _pick_tile(h: int, w: int, c: int, itemsize: int) -> int:
    """Largest 8-aligned H tile whose in+out double-buffered blocks plus the
    resident stats maps fit the VMEM budget."""
    stats_bytes = 2 * (h + 8) * (w + 6) * 4
    for t in (64, 32, 16, 8):
        if h % t:
            continue
        tile_bytes = 4 * t * w * max(c, 128) * itemsize  # in+out, 2x buffered
        if tile_bytes + stats_bytes <= _VMEM_BUDGET:
            return t
    return 0  # no viable tile -> caller falls back to XLA


def _kernel(x_ref, mean_ref, max_ref, w_ref, out_ref, *, tile_h: int,
            width: int):
    t = pl.program_id(1)
    # Sublane-aligned window read (Mosaic requires dim-1 offsets % 8 == 0);
    # the per-tap shifts then happen as static in-register slices.
    row0 = pl.multiple_of(t * tile_h, 8)
    mean_win = mean_ref[0, pl.ds(row0, tile_h + 8), :]
    max_win = max_ref[0, pl.ds(row0, tile_h + 8), :]
    acc = jnp.zeros((tile_h, width), jnp.float32)
    for i in range(7):
        for j in range(7):
            acc = acc + mean_win[i:i + tile_h, j:j + width] * w_ref[i, j, 0, 0]
            acc = acc + max_win[i:i + tile_h, j:j + width] * w_ref[i, j, 1, 0]
    gate = jax.nn.sigmoid(acc)
    x = x_ref[0]
    out_ref[0] = x * gate[:, :, None].astype(x.dtype)


def _kernel_cgate(x_ref, g_ref, mean_ref, max_ref, w_ref, out_ref, *,
                  tile_h: int, width: int):
    """Like `_kernel` but also applies the per-channel CBAM gate in the same
    pass — the standalone channel-gate multiply (read + write of x-sized
    HBM traffic) disappears."""
    t = pl.program_id(1)
    row0 = pl.multiple_of(t * tile_h, 8)
    mean_win = mean_ref[0, pl.ds(row0, tile_h + 8), :]
    max_win = max_ref[0, pl.ds(row0, tile_h + 8), :]
    acc = jnp.zeros((tile_h, width), jnp.float32)
    for i in range(7):
        for j in range(7):
            acc = acc + mean_win[i:i + tile_h, j:j + width] * w_ref[i, j, 0, 0]
            acc = acc + max_win[i:i + tile_h, j:j + width] * w_ref[i, j, 1, 0]
    gate = jax.nn.sigmoid(acc)
    x = x_ref[0]
    g = g_ref[0, 0]
    out_ref[0] = x * g[None, None, :].astype(x.dtype) * gate[:, :, None].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spatial_gate_pallas(x: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    """x: (B, H, W, C) NHWC; w: (7, 7, 2, 1) HWIO stencil weights."""
    b, h, width, c = x.shape
    tile_h = _pick_tile(h, width, c, x.dtype.itemsize)
    if tile_h == 0:
        return spatial_gate_reference(x, w)
    xf = x.astype(jnp.float32)
    # Rows: 3 halo on top, 5 below (window reads are tile_h + 8 rows).
    mean = jnp.pad(jnp.mean(xf, axis=-1),
                   ((0, 0), (_HALO, _HALO + 2), (_HALO, _HALO)))
    mx = jnp.pad(jnp.max(xf, axis=-1),
                 ((0, 0), (_HALO, _HALO + 2), (_HALO, _HALO)))

    kernel = functools.partial(_kernel, tile_h=tile_h, width=width)
    stats_spec = pl.BlockSpec((1, h + 2 * _HALO + 2, width + 2 * _HALO),
                              lambda bi, ti: (bi, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec((1, tile_h, width, c), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            stats_spec,
            stats_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, width, c), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, mean, mx, w.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def channel_spatial_gate_pallas(x: jax.Array, g: jax.Array, w: jax.Array,
                                interpret: bool = False) -> jax.Array:
    """Fused CBAM application: out = (x*g) * sigmoid(conv7x7(stats(x*g))).

    x: (B, H, W, C); g: (B, C) channel gate; w: (7, 7, 2, 1). The (mean,
    max) maps of the GATED tensor are computed XLA-side WITHOUT
    materialising x*g (the multiply fuses into the reductions); the Pallas
    kernel then reads x once, applies g and the spatial gate, and writes
    once — one full read+write pass fewer than gating in two steps."""
    b, h, width, c = x.shape
    tile_h = _pick_tile(h, width, c, x.dtype.itemsize)
    if tile_h == 0:
        return channel_spatial_gate_reference(x, g, w)
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = jnp.einsum("nhwc,nc->nhw", xf, gf) / c
    mx = jnp.max(xf * gf[:, None, None, :], axis=-1)
    mean = jnp.pad(mean, ((0, 0), (_HALO, _HALO + 2), (_HALO, _HALO)))
    mx = jnp.pad(mx, ((0, 0), (_HALO, _HALO + 2), (_HALO, _HALO)))

    kernel = functools.partial(_kernel_cgate, tile_h=tile_h, width=width)
    stats_spec = pl.BlockSpec((1, h + 2 * _HALO + 2, width + 2 * _HALO),
                              lambda bi, ti: (bi, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec((1, tile_h, width, c), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            # (b, 1, c) with a (1, 1, c) block: Mosaic requires the last
            # two block dims to be (8, 128)-divisible OR equal to the array
            # dims — a flat (1, c) gate block fails that check on real TPU.
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            stats_spec,
            stats_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, width, c), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, g.reshape(b, 1, c), mean, mx, w.astype(jnp.float32))


def channel_spatial_gate_reference(x: jax.Array, g: jax.Array,
                                   w: jax.Array) -> jax.Array:
    """Plain-XLA reference of the fused op (tests, fallback, backward)."""
    gated = x * g[:, None, None, :].astype(x.dtype)
    return spatial_gate_reference(gated, w)


@jax.custom_vjp
def channel_spatial_gate(x: jax.Array, g: jax.Array, w: jax.Array) -> jax.Array:
    """Differentiable fused channel+spatial CBAM gate: Pallas forward,
    XLA-derived exact backward."""
    return channel_spatial_gate_pallas(x, g, w)


def _cs_gate_fwd(x, g, w):
    return channel_spatial_gate_pallas(x, g, w), (x, g, w)


def _cs_gate_bwd(residuals, ct):
    x, g, w = residuals
    _, vjp = jax.vjp(channel_spatial_gate_reference, x, g, w)
    return vjp(ct)


channel_spatial_gate.defvjp(_cs_gate_fwd, _cs_gate_bwd)


def spatial_gate_reference(x: jax.Array, w: jax.Array) -> jax.Array:
    """Plain-XLA reference of the same op (used by tests, as fallback, and
    for the backward pass)."""
    stats = jnp.stack([jnp.mean(x, axis=-1), jnp.max(x, axis=-1)], axis=-1)
    gate = jax.lax.conv_general_dilated(
        stats.astype(x.dtype), w.astype(x.dtype), (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x * jax.nn.sigmoid(gate)


@jax.custom_vjp
def spatial_gate(x: jax.Array, w: jax.Array) -> jax.Array:
    """Differentiable fused spatial gate: Pallas forward, XLA-derived
    backward (pallas_call has no autodiff rule; the reference formulation
    provides the exact gradient)."""
    return spatial_gate_pallas(x, w)


def _spatial_gate_fwd(x, w):
    return spatial_gate_pallas(x, w), (x, w)


def _spatial_gate_bwd(residuals, g):
    x, w = residuals
    _, vjp = jax.vjp(spatial_gate_reference, x, w)
    return vjp(g)


spatial_gate.defvjp(_spatial_gate_fwd, _spatial_gate_bwd)
