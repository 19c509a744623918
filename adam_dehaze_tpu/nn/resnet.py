"""ResNet backbones (flax, NHWC) for the fog-intensity classifier and as a
detection backbone.

Own implementation of the torchvision-equivalent architecture used by the
reference classifier (reference: models/classifier.py:22-36): conv7x7/2 ->
maxpool3x3/2 -> 4 stages of basic/bottleneck blocks -> global average pool.
Structure and parameter shapes match torchvision's resnet{18,34,50} exactly so
converted checkpoints line up; BN follows torch semantics (momentum 0.9,
eps 1e-5).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _bn(train: bool, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = _bn(train, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = _bn(train, self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32)(x)
            identity = _bn(train, self.dtype)(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out_ch = self.features * 4
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        y = _bn(train, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = _bn(train, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        y = _bn(train, self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32)(x)
            identity = _bn(train, self.dtype)(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """Returns pooled features (B, feature_dim); optionally the stage feature
    maps for FPN-style detection necks."""
    stage_sizes: Sequence[int]
    block: str = "basic"  # basic | bottleneck
    dtype: Dtype = jnp.float32
    return_stages: bool = False

    @property
    def feature_dim(self) -> int:
        return 512 if self.block == "basic" else 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=dt, param_dtype=jnp.float32)(x)
        x = _bn(train, dt)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        stages = []
        widths = (64, 128, 256, 512)
        for i, (n_blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = block_cls(w, stride=stride, dtype=dt)(x, train)
            stages.append(x)

        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if self.return_stages:
            return pooled, stages
        return pooled


def resnet18(dtype=jnp.float32, return_stages=False) -> ResNet:
    return ResNet((2, 2, 2, 2), "basic", dtype, return_stages)


def resnet34(dtype=jnp.float32, return_stages=False) -> ResNet:
    return ResNet((3, 4, 6, 3), "basic", dtype, return_stages)


def resnet50(dtype=jnp.float32, return_stages=False) -> ResNet:
    return ResNet((3, 4, 6, 3), "bottleneck", dtype, return_stages)
