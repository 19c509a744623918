"""Batched on-device image-quality metrics (PSNR, SSIM).

The reference computes these per image on the host with skimage inside its
validation hot loop (reference: training/train_dehazing.py:146-159,
evaluation/metrics.py:13-36) — one device->host transfer per image. Here they
are batched XLA programs: one call per batch, no host round-trips.

Numerical parity targets:
- `psnr`: skimage.metrics.peak_signal_noise_ratio with data_range
  (10*log10(dr^2 / mse)).
- `ssim_gray`: skimage.metrics.structural_similarity defaults on the
  channel-mean grayscale image (the reference's convention,
  evaluation/metrics.py:30-32): uniform 7x7 filter, K1=0.01, K2=0.03,
  sample covariance (N/(N-1)), and the result averaged over the
  pad-cropped valid region.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Per-image PSNR in dB. pred/target: (N, H, W, C) or (N, H, W)."""
    axes = tuple(range(1, pred.ndim))
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
                   axis=axes)
    return 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(mse, 1e-12))


def _uniform_filter(x: jax.Array, size: int) -> jax.Array:
    """VALID-mode mean filter over the last two axes of (N, H, W).

    precision=HIGHEST is essential: TPU convs default to bf16 passes, and the
    variance term cov_norm*(uxx - ux*ux) catastrophically cancels at bf16
    (observed SSIM > 1 on real hardware without this)."""
    w = jnp.full((size, size, 1, 1), 1.0 / (size * size), x.dtype)
    y = jax.lax.conv_general_dilated(
        x[..., None], w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y[..., 0]


@functools.partial(jax.jit, static_argnames=("win_size",))
def ssim_gray(pred: jax.Array, target: jax.Array, data_range: float = 1.0,
              win_size: int = 7) -> jax.Array:
    """Per-image SSIM on channel-mean grayscale, skimage-default algorithm.

    pred/target: (N, H, W, C) in [0, data_range]; returns (N,).
    """
    if pred.ndim == 4:
        pred = jnp.mean(pred, axis=-1)
        target = jnp.mean(target, axis=-1)
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)

    NP = win_size ** 2
    cov_norm = NP / (NP - 1)  # sample covariance, skimage default
    ux = _uniform_filter(x, win_size)
    uy = _uniform_filter(y, win_size)
    uxx = _uniform_filter(x * x, win_size)
    uyy = _uniform_filter(y * y, win_size)
    uxy = _uniform_filter(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    num = (2 * ux * uy + C1) * (2 * vxy + C2)
    den = (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)
    s = num / den
    # VALID conv already removed the window border; skimage additionally crops
    # pad = (win-1)//2 from its SAME-filtered maps, which leaves the same
    # valid region — so a plain mean here matches skimage's crop+mean.
    return jnp.mean(s, axis=(1, 2))


@jax.jit
def batch_quality(pred: jax.Array, target: jax.Array):
    """Both metrics in one compiled program: dict of (N,) arrays."""
    return {"psnr": psnr(pred, target), "ssim": ssim_gray(pred, target)}
