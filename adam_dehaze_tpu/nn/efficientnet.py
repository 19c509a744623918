"""EfficientNet-B0 backbone (flax, NHWC).

Classifier-backbone parity with the reference's timm EfficientNet option
(reference: models/classifier.py:38-50). MBConv blocks with squeeze-excite,
SiLU activations, feature_dim 1280.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

# (expansion, channels, repeats, stride, kernel) — EfficientNet-B0 table.
_B0_CONFIG = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


def _bn(train, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-3, dtype=dtype, param_dtype=jnp.float32)


class SqueezeExcite(nn.Module):
    features: int
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = max(1, int(self.features * self.se_ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(hidden, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    features: int
    stride: int
    expand: int
    kernel: int
    dtype: Any = jnp.float32

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
            y = nn.silu(y)
        p = self.kernel // 2
        y = nn.Conv(hidden, (self.kernel, self.kernel),
                    (self.stride, self.stride), padding=((p, p), (p, p)),
                    feature_group_count=hidden, use_bias=False, dtype=dt,
                    param_dtype=jnp.float32)(y)
        y = _bn(train, dt)(y)
        y = nn.silu(y)
        y = SqueezeExcite(in_ch, dtype=dt)(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=dt,
                    param_dtype=jnp.float32)(y)
        y = _bn(train, dt)(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class EfficientNetB0(nn.Module):
    """Returns pooled features (B, 1280)."""
    dtype: Any = jnp.float32

    feature_dim: int = 1280

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(32, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dt, param_dtype=jnp.float32)(x)
        x = _bn(train, dt)(x)
        x = nn.silu(x)
        for expand, ch, repeats, stride, kernel in _B0_CONFIG:
            for i in range(repeats):
                x = MBConv(ch, stride if i == 0 else 1, expand, kernel,
                           dtype=dt)(x, train)
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=dt,
                    param_dtype=jnp.float32)(x)
        x = _bn(train, dt)(x)
        x = nn.silu(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
