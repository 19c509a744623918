"""MobileNetV2 backbone (flax, NHWC) — lightweight classifier option
(reference: models/classifier.py:52-66 uses torchvision mobilenet_v2)."""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# (expansion t, out channels c, repeats n, first stride s) — MobileNetV2 paper.
_V2_CONFIG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


def _bn(train, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32)


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=dt,
                        param_dtype=jnp.float32)(y)
            y = _bn(train, dt)(y)
            y = nn.relu6(y)
        y = nn.Conv(hidden, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=hidden,
                    use_bias=False, dtype=dt, param_dtype=jnp.float32)(y)
        y = _bn(train, dt)(y)
        y = nn.relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=dt,
                    param_dtype=jnp.float32)(y)
        y = _bn(train, dt)(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    """Returns pooled features (B, 1280)."""
    dtype: Dtype = jnp.float32

    feature_dim: int = 1280

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(32, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dt, param_dtype=jnp.float32)(x)
        x = _bn(train, dt)(x)
        x = nn.relu6(x)
        for t, c, n, s in _V2_CONFIG:
            for i in range(n):
                x = InvertedResidual(c, s if i == 0 else 1, t, dtype=dt)(x, train)
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=dt,
                    param_dtype=jnp.float32)(x)
        x = _bn(train, dt)(x)
        x = nn.relu6(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
