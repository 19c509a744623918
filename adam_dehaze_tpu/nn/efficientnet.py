"""EfficientNet-B0..B3 backbones (flax, NHWC).

Classifier-backbone parity with the reference's timm EfficientNet family
option (reference: models/classifier.py:38-50 accepts any
`efficientnet_*` timm name). MBConv blocks with squeeze-excite, SiLU
activations; B1-B3 follow the paper's compound scaling (width/depth
multipliers + rounded filters/repeats).
"""
from __future__ import annotations

import math
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

# variant -> (width_mult, depth_mult); resolutions are a data-pipeline
# concern, not architectural.
SCALING = {"b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2),
           "b3": (1.2, 1.4)}


def round_filters(filters: float, width: float, divisor: int = 8) -> int:
    """Width scaling with the paper's nearest-multiple-of-8 rule."""
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def efficientnet_feature_dim(variant: str) -> int:
    width, _ = SCALING[variant]
    return round_filters(1280, width)


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


class EfficientNet(nn.Module):
    """Returns pooled features (B, feature_dim) for variant b0..b3."""
    variant: str = "b0"
    dtype: Any = jnp.float32

    @property
    def feature_dim(self) -> int:
        return efficientnet_feature_dim(self.variant)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        width, depth = SCALING[self.variant]
        x = x.astype(dt)
        x = nn.Conv(round_filters(32, width), (3, 3), (2, 2),
                    padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dt, param_dtype=jnp.float32)(x)
        x = _bn(train, dt)(x)
        x = nn.silu(x)
        for expand, ch, repeats, stride, kernel in _B0_CONFIG:
            ch = round_filters(ch, width)
            for i in range(round_repeats(repeats, depth)):
                x = MBConv(ch, stride if i == 0 else 1, expand, kernel,
                           dtype=dt)(x, train)
        x = nn.Conv(self.feature_dim, (1, 1), use_bias=False, dtype=dt,
                    param_dtype=jnp.float32)(x)
        x = _bn(train, dt)(x)
        x = nn.silu(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


def EfficientNetB0(dtype=jnp.float32) -> EfficientNet:
    return EfficientNet(variant="b0", dtype=dtype)
