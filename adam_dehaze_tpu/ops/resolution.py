"""Serving-time resolution scheduling: run an expensive branch at reduced
resolution and lift its correction back to full resolution with a
guided-filter joint upsample (He et al., "Fast Guided Filter", 2015).

Why this exists: the high branch is the largest absolute serving cost
(~249 GFLOP/image at 256², ~4x the medium branch) and its inner conv
stacks already run at XLA's in-context peak (benchmarks/PROFILE.md), so
further wins there are algorithmic, not kernel-level. Haze is dominantly a
low-frequency phenomenon — the additive correction `branch(x) - x` carries
far less high-frequency content than the image itself — so computing it at
half resolution quarters the branch FLOPs while the full-resolution hazy
image supplies the edges through the guided upsample.

This is a QUALITY DIAL, not an equivalence-preserving serving path: outputs
differ from the canonical branch, so it is opt-in
(`AdaptiveDehazer.route_hard(..., lowres=("high",))`) and never an autotune
candidate (serving_autotune.py only A/Bs equivalence-tested paths). The
measured PSNR/latency trade lives in benchmarks/round_results/ (see
tools/probe_lowres.py).

No reference counterpart: the reference serves every branch at full
resolution (`/root/reference/models/high_intensity.py`).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from adam_dehaze_tpu.data.synthetic import _box_filter
from adam_dehaze_tpu.nn.blocks import resize_bilinear


def _gray(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H, W) luminance-ish mean over channels."""
    return jnp.mean(x, axis=-1)


def guided_upsample(guide_hi: jax.Array, guide_lo: jax.Array,
                    src_lo: jax.Array, radius: int = 4,
                    eps: float = 1e-4) -> jax.Array:
    """Joint upsampling of a low-res map with a high-res grayscale guide.

    Fast-guided-filter formulation: solve the local linear model
    `src ≈ a * guide + b` entirely at LOW resolution (box filters over
    (2r+1)² windows via the integral-image `_box_filter`), then bilinearly
    upsample the smoothed coefficient planes and apply them against the
    full-resolution guide — O(low-res) filtering cost, full-res edges.

    guide_hi: (N, H, W) grayscale full-res guide.
    guide_lo: (N, h, w) the same guide at src_lo's resolution.
    src_lo:   (N, h, w, C) the map to upsample (e.g. a dehazing correction).
    Returns (N, H, W, C).
    """
    n, h, w, c = src_lo.shape
    g = guide_lo[:, None]                              # (N, 1, h, w)
    s = jnp.transpose(src_lo, (0, 3, 1, 2))            # (N, C, h, w)
    mean_g = _box_filter(g, radius)
    mean_s = _box_filter(s, radius)
    corr_gs = _box_filter(g * s, radius)
    corr_gg = _box_filter(g * g, radius)
    var_g = corr_gg - mean_g * mean_g
    cov_gs = corr_gs - mean_g * mean_s
    a = cov_gs / (var_g + eps)
    b = mean_s - a * mean_g
    a = _box_filter(a, radius)
    b = _box_filter(b, radius)
    hi = guide_hi.shape[-2:]
    a = resize_bilinear(jnp.transpose(a, (0, 2, 3, 1)), hi)   # (N, H, W, C)
    b = resize_bilinear(jnp.transpose(b, (0, 2, 3, 1)), hi)
    return a * guide_hi[..., None] + b


def make_lowres_apply(apply_fn: Callable[[jax.Array], jax.Array],
                      scale: int = 2, mode: str = "guided",
                      radius: int = 4, eps: float = 1e-4,
                      ) -> Callable[[jax.Array], jax.Array]:
    """Wrap a full-res dehazing apply into a reduced-resolution one.

    x -> downsample by `scale` -> apply_fn -> correction (out_lo - x_lo)
      -> lift to full res (`guided` joint upsample or plain `bilinear`)
      -> clip(x + correction).

    Works for any branch because it lifts the residual correction, not the
    output: identity content (the image itself) never goes through the
    resample pair, so a zero-correction branch stays exactly identity.
    """
    if mode not in ("guided", "bilinear"):
        raise ValueError(f"mode must be guided|bilinear, got {mode!r}")

    def apply(x: jax.Array) -> jax.Array:
        n, hh, ww, c = x.shape
        lo: Tuple[int, int] = (hh // scale, ww // scale)
        x_lo = resize_bilinear(x, lo)
        out_lo = apply_fn(x_lo).astype(jnp.float32)
        corr_lo = out_lo - x_lo
        if mode == "guided":
            corr = guided_upsample(_gray(x), _gray(x_lo), corr_lo,
                                   radius=radius, eps=eps)
        else:
            corr = resize_bilinear(corr_lo, (hh, ww))
        return jnp.clip(x + corr, 0.0, 1.0)

    return apply
