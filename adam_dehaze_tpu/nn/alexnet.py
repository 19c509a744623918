"""AlexNet feature extractor for LPIPS (flax, NHWC).

Mirrors the torchvision AlexNet `features` trunk that the `lpips` package
uses (reference: training/loss.py:86-108 via lpips.LPIPS(net='alex')); the
five post-ReLU taps are the LPIPS feature set.
"""
from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn


class AlexNetFeatures(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        dt = self.dtype
        taps = []
        x = x.astype(dt)
        x = nn.Conv(64, (11, 11), (4, 4), padding=((2, 2), (2, 2)), dtype=dt,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), dtype=dt,
                    param_dtype=jnp.float32, name="conv2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                    param_dtype=jnp.float32, name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                    param_dtype=jnp.float32, name="conv4")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                    param_dtype=jnp.float32, name="conv5")(x)
        x = nn.relu(x)
        taps.append(x)
        return [t.astype(jnp.float32) for t in taps]
