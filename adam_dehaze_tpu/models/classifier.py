"""Fog-intensity classifier ("HDEN" in the paper's vocabulary).

Backbone (+ global pool) feeding a small MLP head; forward returns
(logits, features) exactly like the reference
(reference: models/classifier.py:6-97). Backbones are own flax
implementations (nn/resnet.py, nn/mobilenet.py); `pretrained` weights can be
loaded from a converted torchvision checkpoint via
training/checkpoint.py:load_torch_resnet (gated — torchvision is not
available in this environment).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from adam_dehaze_tpu.nn.efficientnet import (
    EfficientNet,
    efficientnet_feature_dim,
)
from adam_dehaze_tpu.nn.mobilenet import MobileNetV2, MobileNetV3
from adam_dehaze_tpu.nn.resnet import resnet18, resnet34, resnet50

Dtype = Any

_BACKBONES = {
    "resnet18": (resnet18, 512),
    "resnet34": (resnet34, 512),
    "resnet50": (resnet50, 2048),
    "mobilenet_v2": (lambda dtype: MobileNetV2(dtype=dtype), 1280),
    "mobilenet_v3_small": (
        lambda dtype: MobileNetV3(variant="small", dtype=dtype), 576),
    "mobilenet_v3_large": (
        lambda dtype: MobileNetV3(variant="large", dtype=dtype), 960),
    **{f"efficientnet_b{i}": (
        (lambda v: lambda dtype: EfficientNet(variant=v, dtype=dtype))(f"b{i}"),
        efficientnet_feature_dim(f"b{i}"))
       for i in range(4)},
}


class FogIntensityClassifier(nn.Module):
    """3-way fog-intensity classifier; __call__ -> (logits, features)."""
    model_name: str = "resnet18"
    num_classes: int = 3
    dtype: Dtype = jnp.float32

    @property
    def feature_dim(self) -> int:
        return _BACKBONES[self.model_name][1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.model_name not in _BACKBONES:
            raise ValueError(f"Unsupported model: {self.model_name}")
        ctor, _ = _BACKBONES[self.model_name]
        backbone = ctor(dtype=self.dtype)
        features = backbone(x, train)
        # Head: Dropout(.3) -> Dense(256) -> ReLU -> Dropout(.2) -> Dense(C)
        # (reference: classifier.py:72-78).
        h = nn.Dropout(0.3, deterministic=not train)(features)
        h = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Dropout(0.2, deterministic=not train)(h)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=jnp.float32)(h)
        return logits.astype(jnp.float32), features


class DenseFeatureExtractor(nn.Module):
    """Dense (spatial) feature maps from a backbone, no pooling/head
    (reference: models/classifier.py:105-136 — defined there but unused by
    the pipeline; provided for API parity). Returns the last stage map
    (B, H/32, W/32, C)."""
    model_name: str = "resnet18"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from adam_dehaze_tpu.nn.resnet import resnet18, resnet34, resnet50
        ctors = {"resnet18": resnet18, "resnet34": resnet34,
                 "resnet50": resnet50}
        if self.model_name not in ctors:
            raise ValueError(
                f"Unsupported model for feature extraction: {self.model_name}")
        backbone = ctors[self.model_name](dtype=self.dtype, return_stages=True)
        _, stages = backbone(x, train)
        return stages[-1]


def create_classifier(config) -> FogIntensityClassifier:
    """(reference: models/classifier.py:139-145)"""
    dtype = jnp.dtype(config.get("tpu", {}).get("compute_dtype", "float32"))
    return FogIntensityClassifier(
        model_name=config["classifier"]["model"],
        num_classes=config["classifier"]["num_classes"],
        dtype=dtype,
    )
