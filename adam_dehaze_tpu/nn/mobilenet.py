"""MobileNetV2/V3 backbones (flax, NHWC) — lightweight classifier options
(reference: models/classifier.py:52-66 uses torchvision mobilenet_v2 and
mobilenet_v3_{small,large}; feature dims 1280 / 576 / 960)."""
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


# ---------------------------------------------------------------------------
# MobileNetV3 (paper config; structure/param shapes match torchvision's
# mobilenet_v3_{small,large} features so converted checkpoints line up).
# ---------------------------------------------------------------------------

def hardswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def hardsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def _make_divisible(v: int, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# (kernel, expanded ch, out ch, use_se, use_hardswish, stride)
V3_LARGE_CONFIG = [
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]

V3_SMALL_CONFIG = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
]


class SqueezeExcite(nn.Module):
    """SE gate with hardsigmoid (torchvision SqueezeExcitation: fc1/fc2 are
    biased 1x1 convs on the pooled vector; squeeze = divisible(exp/4, 8))."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        squeeze = _make_divisible(self.channels // 4, 8)
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(squeeze, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(self.channels, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(s)
        return x * hardsigmoid(s)[:, None, None, :]


class InvertedResidualV3(nn.Module):
    kernel: int
    expanded: int
    features: int
    use_se: bool
    use_hs: bool
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        act = hardswish if self.use_hs else nn.relu
        in_ch = x.shape[-1]
        y = x
        if self.expanded != in_ch:
            y = nn.Conv(self.expanded, (1, 1), use_bias=False, dtype=dt,
                        param_dtype=jnp.float32)(y)
            y = _bn(train, dt)(y)
            y = act(y)
        p = self.kernel // 2
        y = nn.Conv(self.expanded, (self.kernel, self.kernel),
                    (self.stride, self.stride), padding=((p, p), (p, p)),
                    feature_group_count=self.expanded, use_bias=False,
                    dtype=dt, param_dtype=jnp.float32)(y)
        y = _bn(train, dt)(y)
        y = act(y)
        if self.use_se:
            y = SqueezeExcite(self.expanded, dtype=dt)(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=dt,
                    param_dtype=jnp.float32)(y)
        y = _bn(train, dt)(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class MobileNetV3(nn.Module):
    """Returns pooled features: (B, 576) small / (B, 960) large — matching
    the reference's backbone.classifier = Identity contract
    (classifier.py:56-66)."""
    variant: str = "small"  # small | large
    dtype: Dtype = jnp.float32

    @property
    def feature_dim(self) -> int:
        return 576 if self.variant == "small" else 960

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        cfgs = V3_SMALL_CONFIG if self.variant == "small" else V3_LARGE_CONFIG
        x = x.astype(dt)
        x = nn.Conv(16, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dt, param_dtype=jnp.float32)(x)
        x = _bn(train, dt)(x)
        x = hardswish(x)
        for k, exp, c, se, hs, s in cfgs:
            x = InvertedResidualV3(k, exp, c, se, hs, s, dtype=dt)(x, train)
        last = 6 * cfgs[-1][2]  # 576 small / 960 large
        x = nn.Conv(last, (1, 1), use_bias=False, dtype=dt,
                    param_dtype=jnp.float32)(x)
        x = _bn(train, dt)(x)
        x = hardswish(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
