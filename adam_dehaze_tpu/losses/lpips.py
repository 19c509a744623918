"""LPIPS perceptual distance (flax, NHWC).

Own implementation of the metric used by the reference via the `lpips`
package (reference: training/loss.py:86-108, evaluation/metrics.py:44):
AlexNet feature taps, channel-unit-normalised, squared differences weighted
by per-channel linear heads, spatially averaged, summed over layers.

Calibrated linear-head weights can be loaded from a converted `lpips`
checkpoint (training/checkpoint.py:load_torch_lpips; wire via
`loss.lpips_weights`). Without them the heads default to uniform 1/C, which
degrades gracefully to the mean normalised squared feature distance —
monotonic and usable for training, but NOT the published LPIPS scale, so
evaluation reports the uncalibrated value as `lpips_uncal`
(evaluation/metrics.py:ImageQualityMetrics); only calibrated weights earn the
`lpips` key.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from adam_dehaze_tpu.nn.alexnet import AlexNetFeatures

_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])


class LPIPS(nn.Module):
    """__call__(x, y) with inputs in [-1, 1] NHWC -> per-sample distance (N,)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        n = x.shape[0]
        both = (jnp.concatenate([x, y], axis=0) - _SHIFT) / _SCALE
        net = AlexNetFeatures(dtype=self.dtype)
        # Single trunk pass over the concatenated pair (batch-independent
        # features; halves kernel launches vs separate x/y passes).
        feats = net(both)
        fx = [f[:n] for f in feats]
        fy = [f[n:] for f in feats]
        total = jnp.zeros((n,), jnp.float32)
        for i, (a, b) in enumerate(zip(fx, fy)):
            c = a.shape[-1]
            an = a * jax.lax.rsqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            bn = b * jax.lax.rsqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            d = (an - bn) ** 2
            w = self.param(f"lin{i}", nn.initializers.constant(1.0 / c), (c,),
                           jnp.float32)
            # lpips constrains head weights >= 0; enforce with relu.
            total = total + jnp.mean(jnp.sum(d * nn.relu(w), axis=-1), axis=(1, 2))
        return total


def lpips_from_unit_range(lpips_module: LPIPS, params, pred, target):
    """Evaluate LPIPS on [0, 1] images (reference maps to [-1, 1] first,
    loss.py:104-106)."""
    return lpips_module.apply(params, 2.0 * pred - 1.0, 2.0 * target - 1.0)
