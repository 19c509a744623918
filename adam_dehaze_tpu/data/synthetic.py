"""Synthetic fog generation and fog-density estimation, on device.

TPU-native counterpart of the reference's per-image OpenCV fog utilities
(reference: utils/helpers.py:156-299). Everything here is batched, jittable,
and driven by explicit PRNG keys, so an entire batch of fog variants is one
XLA program instead of a host loop. Semantics match the reference:

- atmospheric scattering model  I = J*t + A*(1-t)  with
  t = exp(-beta * depth), radial depth map 0.3 + 0.7*sqrt((x-.5)^2+(y-.2)^2)
  (reference: utils/helpers.py:241-255);
- per-intensity (beta, A) ranges (reference: utils/helpers.py:223-235);
- DCP transmission estimate: min filter over a 15x15 patch, atmospheric light
  from the dark channel, omega=0.95, guided-filter refinement
  (reference: utils/helpers.py:156-199) — here the guided filter is an
  XLA box-filter implementation instead of cv2.ximgproc.

The reference's `create_progressive_test_set` calls `apply_random_fog` with a
(beta, A) pair it doesn't accept (latent bug, utils/helpers.py:289); here
`apply_fog` takes explicit parameters so the progressive set is well-defined.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# (beta_range, A_range) per intensity class (reference: utils/helpers.py:223-235)
INTENSITY_RANGES: Dict[str, Tuple[Tuple[float, float], Tuple[float, float]]] = {
    "low": ((0.1, 0.4), (0.5, 0.7)),
    "medium": ((0.4, 0.7), (0.7, 0.9)),
    "high": ((0.7, 1.0), (0.8, 1.0)),
    "random": ((0.1, 1.0), (0.5, 1.0)),
}

INTENSITY_NAMES = ("low", "medium", "high")


def _depth_map(h: int, w: int) -> jax.Array:
    """Radial depth approximation (reference: utils/helpers.py:241-246)."""
    x = jnp.linspace(0.0, 1.0, w)
    y = jnp.linspace(0.0, 1.0, h)
    xx, yy = jnp.meshgrid(x, y)
    return 0.3 + 0.7 * jnp.sqrt((xx - 0.5) ** 2 + (yy - 0.2) ** 2)


@functools.partial(jax.jit, static_argnames=())
def apply_fog(clear: jax.Array, beta: jax.Array, A: jax.Array) -> jax.Array:
    """Apply the atmospheric scattering model to NHWC images in [0, 1].

    Args:
      clear: (..., H, W, 3) clear images.
      beta: scalar or (batch,) extinction coefficients.
      A: scalar or (batch,) atmospheric light.
    """
    h, w = clear.shape[-3], clear.shape[-2]
    depth = _depth_map(h, w)
    beta = jnp.reshape(jnp.asarray(beta, clear.dtype), (-1,) + (1,) * 3) \
        if jnp.ndim(beta) > 0 else jnp.asarray(beta, clear.dtype)
    A = jnp.reshape(jnp.asarray(A, clear.dtype), (-1,) + (1,) * 3) \
        if jnp.ndim(A) > 0 else jnp.asarray(A, clear.dtype)
    t = jnp.exp(-beta * depth[..., None])
    hazy = clear * t + A * (1.0 - t)
    return jnp.clip(hazy, 0.0, 1.0)


def random_fog_params(key: jax.Array, intensity: jax.Array, batch: int):
    """Sample per-image (beta, A) given integer intensity labels (0/1/2).

    The class ranges match INTENSITY_RANGES; sampling is vectorised with
    `jnp.take` over the range table so it stays inside jit.
    """
    lows_b = jnp.array([INTENSITY_RANGES[n][0][0] for n in INTENSITY_NAMES])
    highs_b = jnp.array([INTENSITY_RANGES[n][0][1] for n in INTENSITY_NAMES])
    lows_a = jnp.array([INTENSITY_RANGES[n][1][0] for n in INTENSITY_NAMES])
    highs_a = jnp.array([INTENSITY_RANGES[n][1][1] for n in INTENSITY_NAMES])
    kb, ka = jax.random.split(key)
    ub = jax.random.uniform(kb, (batch,))
    ua = jax.random.uniform(ka, (batch,))
    beta = lows_b[intensity] + ub * (highs_b[intensity] - lows_b[intensity])
    A = lows_a[intensity] + ua * (highs_a[intensity] - lows_a[intensity])
    return beta, A


@jax.jit
def apply_random_fog(key: jax.Array, clear: jax.Array, intensity: jax.Array) -> jax.Array:
    """Batched random fog: NHWC clear images + integer labels -> hazy images.

    Equivalent to looping the reference's `apply_random_fog`
    (utils/helpers.py:201-265) over a batch, but as one compiled program.
    """
    beta, A = random_fog_params(key, intensity, clear.shape[0])
    return apply_fog(clear, beta, A)


def boundary_fog_params(key: jax.Array, intensity: jax.Array, batch: int,
                        boundary_frac: float = 0.5, margin: float = 0.08):
    """Class-conditional (beta, A) with extra mass at the DECISION BOUNDARIES.

    The fog classes are beta intervals (INTENSITY_RANGES): low/medium meet at
    0.4, medium/high at 0.7. The residual test errors of the trained router
    are confident mistakes on images generated near those edges
    (benchmarks/round_results/margin_routing_r4.json), so uniform-in-range
    sampling under-trains exactly the region that decides routing. With
    probability `boundary_frac` a sample's beta is drawn uniformly from the
    `margin`-wide strip INSIDE its own class adjacent to a class edge (medium
    picks one of its two edges at random); otherwise uniformly from the full
    class range, as in `random_fog_params`. A is always uniform in the class
    range. Labels remain exact — the strip never crosses the edge.
    """
    lows_b = jnp.array([INTENSITY_RANGES[n][0][0] for n in INTENSITY_NAMES])
    highs_b = jnp.array([INTENSITY_RANGES[n][0][1] for n in INTENSITY_NAMES])
    lows_a = jnp.array([INTENSITY_RANGES[n][1][0] for n in INTENSITY_NAMES])
    highs_a = jnp.array([INTENSITY_RANGES[n][1][1] for n in INTENSITY_NAMES])
    # Per class: [lo, hi) of the strip at each of its (up to two) class edges.
    # low: upper edge only; medium: both; high: lower edge only. A class's
    # "missing" second strip aliases its real one so gather stays branch-free.
    strip_lo = jnp.array([
        [highs_b[0] - margin, highs_b[0] - margin],   # low: edge at 0.4
        [lows_b[1], highs_b[1] - margin],             # medium: 0.4 and 0.7
        [lows_b[2], lows_b[2]],                       # high: edge at 0.7
    ])
    strip_hi = strip_lo + margin
    kb, ka, kf, ke = jax.random.split(key, 4)
    ub = jax.random.uniform(kb, (batch,))
    ua = jax.random.uniform(ka, (batch,))
    use_strip = jax.random.bernoulli(kf, boundary_frac, (batch,))
    edge = jax.random.bernoulli(ke, 0.5, (batch,)).astype(jnp.int32)
    beta_full = lows_b[intensity] + ub * (highs_b[intensity] - lows_b[intensity])
    s_lo = strip_lo[intensity, edge]
    s_hi = strip_hi[intensity, edge]
    beta_strip = s_lo + ub * (s_hi - s_lo)
    beta = jnp.where(use_strip, beta_strip, beta_full)
    A = lows_a[intensity] + ua * (highs_a[intensity] - lows_a[intensity])
    return beta, A


def refog_batch(key: jax.Array, batch, prob: float = 0.5,
                boundary_frac: float = 0.5, margin: float = 0.08):
    """Replace a random subset of a triplet batch's hazy images with FRESH
    fog rendered from the clear images (boundary-weighted beta).

    Classifier-training augmentation (jit-friendly, runs inside the train
    step): the stored corpus shows each clear image under exactly one (beta,
    A) draw; re-fogging exposes the classifier to the full generating
    distribution, concentrated where classes meet. Labels are unchanged.
    Returns the batch dict with only "hazy" replaced.
    """
    n = batch["hazy"].shape[0]
    kp, kf = jax.random.split(key)
    beta, A = boundary_fog_params(kf, batch["intensity"], n,
                                  boundary_frac=boundary_frac, margin=margin)
    fresh = apply_fog(batch["clear"], beta, A)
    take = jax.random.bernoulli(kp, prob, (n,))[:, None, None, None]
    out = dict(batch)
    out["hazy"] = jnp.where(take, fresh, batch["hazy"])
    return out


def _min_filter(x: jax.Array, size: int) -> jax.Array:
    """Sliding-window minimum (erosion) with SAME padding, (..., H, W).

    Separable: two 1D passes (2*size compares/pixel instead of size^2)."""
    pad = size // 2

    def pass_1d(v, axis_offset):
        window = [1] * v.ndim
        window[axis_offset] = size
        padding = [(0, 0)] * v.ndim
        padding[axis_offset] = (pad, pad)
        return -jax.lax.reduce_window(
            -v, -jnp.inf, jax.lax.max, tuple(window), (1,) * v.ndim,
            tuple(padding))

    return pass_1d(pass_1d(x, x.ndim - 2), x.ndim - 1)


def _box_filter(x: jax.Array, radius: int) -> jax.Array:
    """Mean filter over a (2r+1)^2 window with edge-aware normalisation.

    Integral-image (2D cumsum) formulation: O(1) work per pixel regardless of
    radius — the DCP path uses radius 40, which would cost 6561 adds/pixel as
    a naive reduce_window."""
    h, w = x.shape[-2], x.shape[-1]

    def windowed_sum(v):
        ii = jnp.cumsum(jnp.cumsum(v, axis=-2), axis=-1)
        ii = jnp.pad(ii, [(0, 0)] * (v.ndim - 2) + [(1, 0), (1, 0)])
        # Clamped window bounds: [lo, hi) per row/col.
        r_hi = jnp.clip(jnp.arange(h) + radius + 1, 0, h)
        r_lo = jnp.clip(jnp.arange(h) - radius, 0, h)
        c_hi = jnp.clip(jnp.arange(w) + radius + 1, 0, w)
        c_lo = jnp.clip(jnp.arange(w) - radius, 0, w)
        a = ii[..., r_hi, :][..., :, c_hi]
        b = ii[..., r_hi, :][..., :, c_lo]
        c = ii[..., r_lo, :][..., :, c_hi]
        d = ii[..., r_lo, :][..., :, c_lo]
        return a - b - c + d

    counts = windowed_sum(jnp.ones(x.shape[-2:], x.dtype))
    return windowed_sum(x) / counts


def guided_filter(guide: jax.Array, src: jax.Array, radius: int = 40,
                  eps: float = 1e-3) -> jax.Array:
    """He et al. guided filter on (..., H, W) grayscale arrays.

    XLA-native replacement for cv2.ximgproc.guidedFilter
    (reference: utils/helpers.py:181-194).
    """
    mean_g = _box_filter(guide, radius)
    mean_s = _box_filter(src, radius)
    corr_gs = _box_filter(guide * src, radius)
    corr_gg = _box_filter(guide * guide, radius)
    var_g = corr_gg - mean_g * mean_g
    cov_gs = corr_gs - mean_g * mean_s
    a = cov_gs / (var_g + eps)
    b = mean_s - a * mean_g
    return _box_filter(a, radius) * guide + _box_filter(b, radius)


@functools.partial(jax.jit, static_argnames=("patch_size", "radius"))
def estimate_transmission_dcp(hazy: jax.Array, patch_size: int = 15,
                              radius: int = 40, omega: float = 0.95) -> jax.Array:
    """Dark-channel-prior transmission estimate, batched NHWC -> (N, H, W).

    Mirrors the reference pipeline (utils/helpers.py:156-199): grayscale,
    15x15 erosion, atmospheric light = max of dark channel, transmission =
    1 - omega * dark / max(A, 0.1), then guided-filter refinement.
    """
    gray = jnp.mean(hazy, axis=-1)
    dark = _min_filter(gray, patch_size)
    A = jnp.max(dark, axis=(-2, -1), keepdims=True)
    t = 1.0 - omega * dark / jnp.maximum(A, 0.1)
    return guided_filter(gray, t, radius=radius)


@jax.jit
def fog_density_map(hazy: jax.Array, beta: float = 1.0) -> jax.Array:
    """Per-pixel fog-density proxy exp(-beta * transmission), (N, H, W).

    Used by the density-weighted adaptive loss (`loss.density_weighted`)
    and mirrors `create_mask_from_transmission` (utils/helpers.py:156-199).
    """
    t = estimate_transmission_dcp(hazy)
    return jnp.exp(-beta * t)


def create_progressive_test_set(clear_imgs_dir: str, output_dir: str,
                                fog_levels: int = 5) -> int:
    """Write hazy versions of every clear image at increasing fog intensity
    (reference: utils/helpers.py:267-299 — unreachable there due to an
    argument-arity bug at :289; functional here). Returns images written."""
    import os
    from pathlib import Path

    import cv2
    import numpy as np

    os.makedirs(output_dir, exist_ok=True)
    paths = sorted(list(Path(clear_imgs_dir).glob("*.jpg"))
                   + list(Path(clear_imgs_dir).glob("*.png")))
    levels = progressive_fog_levels(fog_levels)
    written = 0
    for img_path in paths:
        bgr = cv2.imread(str(img_path))
        if bgr is None:
            continue
        clear = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        batch = jnp.asarray(clear[None])
        for i, (beta, A) in enumerate(levels):
            hazy = np.asarray(apply_fog(batch, beta, A))[0]
            out = cv2.cvtColor((hazy * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
            cv2.imwrite(os.path.join(output_dir,
                                     f"{img_path.stem}_fog{i + 1}.png"), out)
            written += 1
    return written


def progressive_fog_levels(n_levels: int = 5):
    """(beta, A) schedule for a progressive test set.

    Matches the intended parameters of the reference's
    `create_progressive_test_set` (utils/helpers.py:282-286), which were
    unreachable there due to an argument-arity bug (utils/helpers.py:289).
    """
    out = []
    for i in range(n_levels):
        f = (i + 1) / n_levels
        out.append((0.1 + 0.9 * f, 0.5 + 0.5 * f))
    return out
