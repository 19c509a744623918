"""On-device batched augmentation (jit-friendly).

Replaces the reference's host-side seeded same-transform augmentation
(reference: data/dataset.py:57-64,101-116: RandomHorizontalFlip,
RandomVerticalFlip, ColorJitter(brightness=0.1, contrast=0.1) applied with a
shared seed to the hazy/clear/dehazed triplet). Here the whole batch is
augmented inside the jitted train step: per-sample flip bits and jitter
factors are sampled once and applied identically to all three images of a
triplet, preserving the pairing invariant.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

_GRAY = jnp.array([0.299, 0.587, 0.114])


def _flip(imgs, hflip, vflip):
    """imgs: (N, H, W, C); hflip/vflip: (N,) bool."""
    h = hflip[:, None, None, None]
    v = vflip[:, None, None, None]
    imgs = jnp.where(h, imgs[:, :, ::-1, :], imgs)
    imgs = jnp.where(v, imgs[:, ::-1, :, :], imgs)
    return imgs


def _color_jitter(imgs, brightness, contrast):
    """Per-sample brightness/contrast factors, torch ColorJitter semantics
    (multiplicative brightness; contrast blends with the mean gray level)."""
    b = brightness[:, None, None, None]
    c = contrast[:, None, None, None]
    imgs = imgs * b
    gray_mean = jnp.mean(imgs @ _GRAY, axis=(1, 2))[:, None, None, None]
    imgs = (imgs - gray_mean) * c + gray_mean
    return jnp.clip(imgs, 0.0, 1.0)


def augment_triplet(key: jax.Array, batch: Dict[str, jax.Array],
                    brightness: float = 0.1, contrast: float = 0.1
                    ) -> Dict[str, jax.Array]:
    """Augment {hazy, clear, dehazed} identically per sample."""
    n = batch["hazy"].shape[0]
    kh, kv, kb, kc = jax.random.split(key, 4)
    hflip = jax.random.bernoulli(kh, 0.5, (n,))
    vflip = jax.random.bernoulli(kv, 0.5, (n,))
    bf = jax.random.uniform(kb, (n,), minval=1 - brightness, maxval=1 + brightness)
    cf = jax.random.uniform(kc, (n,), minval=1 - contrast, maxval=1 + contrast)
    out = dict(batch)
    for name in ("hazy", "clear", "dehazed"):
        if name in batch:
            img = _flip(batch[name], hflip, vflip)
            out[name] = _color_jitter(img, bf, cf)
    return out
