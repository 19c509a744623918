"""VGG16 feature extractor for the content loss (flax, NHWC).

One forward pass collects all requested activation taps, fixing the
reference's per-layer sub-network rebuild inside the training hot loop
(reference: training/loss.py:70-84). Layer names follow the torch
convention (relu{stage}_{idx}) so the config surface matches.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

# (stage, convs-per-stage) for VGG16: 2,2,3,3,3 with widths 64..512.
_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


class VGG16Features(nn.Module):
    """Returns {tap_name: activation} for the requested taps."""
    taps: Sequence[str] = ("relu2_2", "relu3_3", "relu4_3")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        # Inputs are [0,1] RGB; normalize with ImageNet stats
        # (reference: loss.py:62-67).
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        x = x.astype(self.dtype)
        wanted = set(self.taps)
        out: Dict[str, jnp.ndarray] = {}
        deepest = max(int(t[4]) for t in wanted)
        for si, (width, n_convs) in enumerate(_STAGES, start=1):
            if si > deepest:
                break
            for ci in range(1, n_convs + 1):
                x = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{si}_{ci}")(x)
                x = nn.relu(x)
                name = f"relu{si}_{ci}"
                if name in wanted:
                    out[name] = x.astype(jnp.float32)
            if si < deepest:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return out
