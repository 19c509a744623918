"""Fused CBAM spatial-attention gate as a Pallas TPU kernel.

The spatial gate of the reference AttentionBlock
(reference: models/dehazing/base_model.py:72-78) is

    stats = [mean_c(x), max_c(x)]          # (B, H, W, 2)
    gate  = sigmoid(conv7x7(stats))        # zero padding 3
    out   = x * gate

Executed naively this costs ~3 HBM reads + 2 writes of x-sized traffic (write
stats, read stats, read x again for the multiply). This kernel fuses the
channel reduction, the 7x7 stencil, the sigmoid and the multiply into a single
pass: x is DMA'd tile-by-tile (with a 3-row halo) HBM->VMEM, everything else
happens in VMEM, and only the gated output is written back — ~1x read + 1x
write, i.e. ~2.5x less HBM traffic for a bandwidth-bound op.

Grid: (batch, H/TILE_H). Halo handling: x is pre-padded by 3 rows of zeros on
H (so every DMA slice is in bounds) and the W halo is padded in-register.
Zero rows produce zero stats, which exactly reproduces the zero-padded conv.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 3  # (7 - 1) // 2


def _pick_tile(h: int) -> int:
    for t in (64, 32, 16, 8, 4, 2, 1):
        if h % t == 0 and t <= h:
            return t
    return h


def _kernel(x_hbm, w_ref, out_ref, x_scr, sem, *, tile_h: int, width: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile_h, tile_h + 2 * _HALO)], x_scr, sem)
    dma.start()
    dma.wait()

    x = x_scr[:]  # (tile_h + 6, W, C)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1)
    mx = jnp.max(xf, axis=-1)
    # (tile_h + 6, W + 6, 2) with zero-padded W halo.
    stats = jnp.stack([mean, mx], axis=-1)
    stats = jnp.pad(stats, ((0, 0), (_HALO, _HALO), (0, 0)))

    acc = jnp.zeros((tile_h, width), jnp.float32)
    for i in range(7):
        for j in range(7):
            for k in range(2):
                acc = acc + stats[i:i + tile_h, j:j + width, k] * w_ref[i, j, k, 0]
    gate = jax.nn.sigmoid(acc)
    out_ref[0] = (x[_HALO:_HALO + tile_h] * gate[:, :, None].astype(x.dtype))


@functools.partial(jax.jit, static_argnames=("interpret",))
def spatial_gate_pallas(x: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    """x: (B, H, W, C) NHWC; w: (7, 7, 2, 1) HWIO stencil weights."""
    b, h, width, c = x.shape
    tile_h = _pick_tile(h)
    x_pad = jnp.pad(x, ((0, 0), (_HALO, _HALO), (0, 0), (0, 0)))

    kernel = functools.partial(_kernel, tile_h=tile_h, width=width)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, width, c), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, width, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_pad, w.astype(jnp.float32))


def spatial_gate_reference(x: jax.Array, w: jax.Array) -> jax.Array:
    """Plain-XLA reference of the same op (used by tests and as fallback)."""
    stats = jnp.stack([jnp.mean(x, axis=-1), jnp.max(x, axis=-1)], axis=-1)
    gate = jax.lax.conv_general_dilated(
        stats.astype(x.dtype), w.astype(x.dtype), (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x * jax.nn.sigmoid(gate)
