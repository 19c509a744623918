"""Fused 3-branch weighted blend as a Pallas TPU kernel.

The soft router blends branch outputs with per-sample weights
(reference: models/routing.py:121-127):

    out[n] = w[n,0]*low[n] + w[n,1]*med[n] + w[n,2]*high[n]

One pass over the three branch outputs with the per-sample scalar weights
prefetched into SMEM; avoids XLA materialising the intermediate scaled
tensors when fusion heuristics decline.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(w_ref, a_ref, b_ref, c_ref, out_ref):
    n = pl.program_id(0)
    w0 = w_ref[n, 0]
    w1 = w_ref[n, 1]
    w2 = w_ref[n, 2]
    out_ref[...] = (a_ref[...] * w0 + b_ref[...] * w1 + c_ref[...] * w2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blend3_pallas(weights: jax.Array, low: jax.Array, med: jax.Array,
                  high: jax.Array, interpret: bool = False) -> jax.Array:
    """weights: (B, 3); low/med/high: (B, H, W, C).

    Images are viewed as (B, H, W*C) so the wide W*C axis sits in the lane
    dimension — a raw (.., W, 3) layout would get its 3-channel lane dim
    padded to 128 by Mosaic (42x VMEM blowup, observed OOM at 256^2).
    """
    b, h, w, c = low.shape
    shape3 = (b, h, w * c)
    low3, med3, high3 = (v.reshape(shape3) for v in (low, med, high))
    tile_h = h
    # With scalar prefetch, index maps also receive the prefetch ref(s).
    spec = pl.BlockSpec((1, tile_h, w * c), lambda n, *_: (n, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(shape3, low.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(weights.astype(low.dtype), low3, med3, high3)
    return out.reshape(low.shape)


def blend3_reference(weights: jax.Array, low: jax.Array, med: jax.Array,
                     high: jax.Array) -> jax.Array:
    w = weights[:, :, None, None, None].astype(low.dtype)
    return w[:, 0] * low + w[:, 1] * med + w[:, 2] * high


@jax.custom_vjp
def blend3(weights: jax.Array, low: jax.Array, med: jax.Array,
           high: jax.Array) -> jax.Array:
    """Differentiable fused blend: Pallas forward, analytic backward."""
    return blend3_pallas(weights, low, med, high)


def _blend3_fwd(weights, low, med, high):
    return blend3_pallas(weights, low, med, high), (weights, low, med, high)


def _blend3_bwd(residuals, g):
    weights, low, med, high = residuals
    gw = jnp.stack([jnp.sum(g * y, axis=(1, 2, 3)) for y in (low, med, high)],
                   axis=1).astype(weights.dtype)
    wb = weights[:, :, None, None, None].astype(g.dtype)
    return gw, wb[:, 0] * g, wb[:, 1] * g, wb[:, 2] * g


blend3.defvjp(_blend3_fwd, _blend3_bwd)
