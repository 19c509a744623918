"""Object detection stage and the integrated dehaze->detect system.

The reference wraps a frozen pretrained torchvision Faster R-CNN purely for
inference-time evaluation (reference: models/detection.py:7-72) and composes
it behind a dehazing router with an ImageNet renormalisation in between
(reference: models/detection.py:74-125). torchvision is unavailable here and
a two-stage RoI pipeline is a poor fit for static-shape XLA, so the detector
is a TPU-native anchor-free single-stage head (FCOS-style) on our ResNet
backbone + FPN:

- Dense per-level predictions (class logits, l/t/r/b offsets, centerness)
  with static shapes — the entire forward is one jitted program.
- Decoding (score threshold, top-k, NMS) runs on host in numpy over the small
  top-k set, mirroring how detection post-processing is done in production
  TPU serving stacks.

The public contract matches the reference: `DetectionModel.predict(images)`
returns per-image {boxes (xyxy), labels, scores} dicts, and
`IntegratedDetectionSystem` = frozen detector ∘ dehazing router with ImageNet
renormalisation between the stages.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from adam_dehaze_tpu.nn.resnet import resnet18, resnet34, resnet50

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])

_BACKBONES = {
    "fcos_resnet18_fpn": resnet18,
    "fcos_resnet34_fpn": resnet34,
    "fcos_resnet50_fpn": resnet50,
    # Reference config names map onto the TPU-native detector
    # (reference: config/config.yaml:67 'faster_rcnn_resnet50_fpn').
    "faster_rcnn_resnet50_fpn": resnet50,
    "faster_rcnn_mobilenet_v3_large_fpn": resnet18,
    # torchvision-weight-compatible layout (see torchvision_compat below):
    # resnet50 + 256-ch FPN P3-P7 + 4-conv GroupNorm towers, so a
    # fcos_resnet50_fpn_coco .pth converts 1:1 via
    # training.checkpoint.load_torch_fcos.
    "tv_fcos_resnet50_fpn": resnet50,
}


class FPN(nn.Module):
    """Top-down feature pyramid over backbone stages C3..C5 -> P3..P5.

    With `extra_levels=True` it additionally produces P6/P7 via stride-2
    3x3 convs on P5 (and relu(P6)) — torchvision's LastLevelP6P7 with
    use_P5=True, the configuration fcos_resnet50_fpn ships."""
    channels: int = 128
    dtype: Any = jnp.float32
    extra_levels: bool = False

    @nn.compact
    def __call__(self, stages: Sequence[jax.Array]) -> List[jax.Array]:
        laterals = [
            nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"lateral{i}")(s)
            for i, s in enumerate(stages)
        ]
        outs = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = jax.image.resize(outs[0], lat.shape, method="nearest")
            outs.insert(0, lat + up)
        smoothed = [
            nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"smooth{i}")(o)
            for i, o in enumerate(outs)
        ]
        if self.extra_levels:
            p6 = nn.Conv(self.channels, (3, 3), (2, 2),
                         padding=((1, 1), (1, 1)), dtype=self.dtype,
                         param_dtype=jnp.float32, name="p6")(smoothed[-1])
            p7 = nn.Conv(self.channels, (3, 3), (2, 2),
                         padding=((1, 1), (1, 1)), dtype=self.dtype,
                         param_dtype=jnp.float32, name="p7")(nn.relu(p6))
            smoothed.extend([p6, p7])
        return smoothed


class FCOSHead(nn.Module):
    """Shared head: class logits, box offsets (l,t,r,b >= 0), centerness.

    `tower_convs=4, group_norm=True, softplus=False` reproduces torchvision's
    FCOSClassificationHead/FCOSRegressionHead tower structure (4x Conv3x3 +
    GroupNorm(32) + ReLU; raw linear offsets), the layout `load_torch_fcos`
    converts into. The native default (2 plain conv+relu, softplus offsets)
    is lighter and keeps parity with round-1..3 checkpoints."""
    num_classes: int
    channels: int = 128
    dtype: Any = jnp.float32
    tower_convs: int = 2
    group_norm: bool = False
    softplus: bool = True

    @nn.compact
    def __call__(self, feat: jax.Array):
        cls = feat
        reg = feat
        for i in range(self.tower_convs):
            cls = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"cls{i}")(cls)
            reg = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"reg{i}")(reg)
            if self.group_norm:
                cls = nn.GroupNorm(32, dtype=self.dtype,
                                   param_dtype=jnp.float32,
                                   name=f"cls_gn{i}")(cls)
                reg = nn.GroupNorm(32, dtype=self.dtype,
                                   param_dtype=jnp.float32,
                                   name=f"reg_gn{i}")(reg)
            cls = nn.relu(cls)
            reg = nn.relu(reg)
        logits = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, param_dtype=jnp.float32,
                         bias_init=nn.initializers.constant(-4.0),
                         name="cls_out")(cls)
        raw = nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                      param_dtype=jnp.float32, name="reg_out")(reg)
        offsets = nn.softplus(raw) if self.softplus else raw
        centerness = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="ctr_out")(reg)
        return logits.astype(jnp.float32), offsets.astype(jnp.float32), \
            centerness.astype(jnp.float32)


class FCOSDetector(nn.Module):
    """Backbone + FPN + shared FCOS head over the pyramid levels.

    `torchvision_compat=True` switches to torchvision's fcos_resnet50_fpn
    geometry — 256-ch FPN over P3..P7 and 4-conv GroupNorm towers with raw
    (linear) offsets — so converted COCO weights run unchanged. torchvision
    normalises regression targets by anchor size, and its FCOS anchors have
    size == stride per level, so pixel offsets are `raw * stride` in both
    modes (reference consumes torchvision detectors the same frozen way,
    models/detection.py:23-51)."""
    num_classes: int = 91
    backbone_name: str = "fcos_resnet18_fpn"
    channels: int = 128
    dtype: Any = jnp.float32
    torchvision_compat: bool = False
    # Native-mode small-object dial: extend the pyramid down to P2
    # (stride 4, from the backbone's C2 stage). Small boxes (< 32 px) get
    # 4x the positive locations they see at stride 8; the level ranges in
    # train_detection.level_ranges shift down accordingly. Static shapes —
    # one extra head application, no dynamic control flow. Ignored in
    # torchvision_compat mode (tv FCOS geometry is fixed P3-P7).
    p2: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = _BACKBONES[self.backbone_name](dtype=self.dtype,
                                                  return_stages=True)
        _, stages = backbone(x, train)
        # C3, C4, C5 (strides 8, 16, 32); with p2 also C2 (stride 4).
        tv = self.torchvision_compat
        lo = 0 if (self.p2 and not tv) else 1
        pyramid = FPN(self.channels, dtype=self.dtype,
                      extra_levels=tv)(stages[lo:4])
        head = FCOSHead(self.num_classes, self.channels, dtype=self.dtype,
                        tower_convs=4 if tv else 2, group_norm=tv,
                        softplus=not tv)
        strides = ((8, 16, 32, 64, 128) if tv
                   else ((4, 8, 16, 32) if self.p2 else (8, 16, 32)))
        outs = []
        for feat, stride in zip(pyramid, strides):
            logits, offsets, ctr = head(feat)
            outs.append({"logits": logits, "offsets": offsets * stride,
                         "centerness": ctr, "stride": stride})
        return outs


def decode_detections(level_outputs, score_threshold: float = 0.05,
                      nms_iou: float = 0.5, max_dets: int = 100,
                      image_size: Optional[Tuple[int, int]] = None
                      ) -> List[Dict[str, np.ndarray]]:
    """Host-side decode of dense predictions -> per-image detection dicts.

    Class index 0 is background (torchvision COCO convention, 91 classes).
    """
    batch = np.asarray(level_outputs[0]["logits"]).shape[0]
    all_boxes = [[] for _ in range(batch)]
    all_scores = [[] for _ in range(batch)]
    all_labels = [[] for _ in range(batch)]
    for lvl in level_outputs:
        logits = np.asarray(lvl["logits"], np.float32)
        offsets = np.asarray(lvl["offsets"], np.float32)
        ctr = np.asarray(lvl["centerness"], np.float32)
        stride = int(lvl["stride"])
        b, h, w, c = logits.shape
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        cx = (xs + 0.5) * stride
        cy = (ys + 0.5) * stride
        probs = _sigmoid(logits) * _sigmoid(ctr)
        probs[..., 0] = 0.0  # background
        for n in range(b):
            keep = probs[n].max(-1) > score_threshold
            if not keep.any():
                continue
            yy, xx = np.nonzero(keep)
            p = probs[n, yy, xx]
            labels = p.argmax(-1)
            scores = p.max(-1)
            off = offsets[n, yy, xx]
            x1 = cx[yy, xx] - off[:, 0]
            y1 = cy[yy, xx] - off[:, 1]
            x2 = cx[yy, xx] + off[:, 2]
            y2 = cy[yy, xx] + off[:, 3]
            boxes = np.stack([x1, y1, x2, y2], axis=1)
            if image_size is not None:
                boxes[:, 0::2] = boxes[:, 0::2].clip(0, image_size[1])
                boxes[:, 1::2] = boxes[:, 1::2].clip(0, image_size[0])
            all_boxes[n].append(boxes)
            all_scores[n].append(scores)
            all_labels[n].append(labels)

    results = []
    for n in range(batch):
        if all_boxes[n]:
            boxes = np.concatenate(all_boxes[n])
            scores = np.concatenate(all_scores[n])
            labels = np.concatenate(all_labels[n])
            keep = nms(boxes, scores, labels, nms_iou)[:max_dets]
            results.append({"boxes": boxes[keep], "scores": scores[keep],
                            "labels": labels[keep]})
        else:
            results.append({"boxes": np.zeros((0, 4), np.float32),
                            "scores": np.zeros((0,), np.float32),
                            "labels": np.zeros((0,), np.int64)})
    return results


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def nms(boxes: np.ndarray, scores: np.ndarray, labels: np.ndarray,
        iou_threshold: float = 0.5) -> np.ndarray:
    """Class-aware greedy NMS; returns kept indices sorted by score."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        same = (labels == labels[i]) & ~suppressed
        idx = np.nonzero(same)[0]
        ix = np.maximum(0, np.minimum(boxes[idx, 2], boxes[i, 2]) -
                        np.maximum(boxes[idx, 0], boxes[i, 0]))
        iy = np.maximum(0, np.minimum(boxes[idx, 3], boxes[i, 3]) -
                        np.maximum(boxes[idx, 1], boxes[i, 1]))
        inter = ix * iy
        iou = inter / np.maximum(areas[idx] + areas[i] - inter, 1e-12)
        suppressed[idx[iou > iou_threshold]] = True
        suppressed[i] = True
    return np.array(keep, np.int64)


def _device_topk(level_outputs, k: int):
    """On-device candidate selection: per level, fuse sigmoid scoring with a
    top-k over locations so only (B, k) candidates cross to the host instead
    of the full dense maps."""
    results = []
    for lvl in level_outputs:
        logits, offsets, ctr = lvl["logits"], lvl["offsets"], lvl["centerness"]
        stride = lvl["stride"]
        b, h, w, c = logits.shape
        probs = jax.nn.sigmoid(logits) * jax.nn.sigmoid(ctr)
        probs = probs.at[..., 0].set(0.0)  # background
        flat = probs.reshape(b, h * w, c)
        scores = jnp.max(flat, axis=-1)
        labels = jnp.argmax(flat, axis=-1)
        kk = min(k, h * w)
        top_scores, top_idx = jax.lax.top_k(scores, kk)
        ys = top_idx // w
        xs = top_idx % w
        cx = (xs.astype(jnp.float32) + 0.5) * stride
        cy = (ys.astype(jnp.float32) + 0.5) * stride
        off = jnp.take_along_axis(offsets.reshape(b, h * w, 4),
                                  top_idx[..., None], axis=1)
        boxes = jnp.stack([cx - off[..., 0], cy - off[..., 1],
                           cx + off[..., 2], cy + off[..., 3]], axis=-1)
        top_labels = jnp.take_along_axis(labels, top_idx, axis=1)
        results.append({"scores": top_scores, "labels": top_labels,
                        "boxes": boxes})
    return results


class DetectionModel:
    """Inference wrapper: jitted dense forward + fused on-device top-k
    candidate selection + host NMS over the small candidate set.

    Plays the role of the reference's DetectionModel
    (reference: models/detection.py:7-72) with the same factory surface.
    """

    def __init__(self, num_classes: int = 91,
                 model_name: str = "fcos_resnet18_fpn",
                 score_threshold: float = 0.05, topk: int = 300,
                 dtype=jnp.float32, pretrained: Optional[str] = None,
                 p2: bool = False):
        if model_name not in _BACKBONES:
            raise ValueError(f"Unsupported detection model: {model_name}")
        tv = model_name.startswith("tv_")
        self.module = FCOSDetector(num_classes=num_classes,
                                   backbone_name=model_name, dtype=dtype,
                                   channels=256 if tv else 128,
                                   torchvision_compat=tv,
                                   p2=p2 and not tv)
        self.model_name = model_name
        self.num_classes = num_classes
        self.score_threshold = score_threshold
        self.topk = topk
        self.pretrained = pretrained
        self.variables = None
        self._forward = None

    def init(self, key, image_size: int = 512):
        dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        self.variables = self.module.init(key, dummy)
        if self.pretrained:
            # Path to a CONVERTED orbax checkpoint (tools/
            # convert_reference_checkpoint.py --kind fcos), mirroring the
            # classifier.pretrained convention (train_classifier.py).
            from adam_dehaze_tpu.training.checkpoint import load_checkpoint
            restored, _metrics = load_checkpoint(self.pretrained,
                                                 target=dict(self.variables))
            self.variables = {"params": restored["params"],
                              "batch_stats": restored["batch_stats"]}
            print(f"Loaded pretrained detector from {self.pretrained}")
        self._forward = jax.jit(
            lambda v, x: _device_topk(self.module.apply(v, x), self.topk))
        return self.variables

    def __call__(self, images: jax.Array) -> List[Dict[str, np.ndarray]]:
        """images: (N, H, W, 3), ImageNet-normalised. Returns torchvision-style
        per-image dicts."""
        levels = jax.device_get(self._forward(self.variables, images))
        h, w = images.shape[1:3]
        batch = images.shape[0]
        results = []
        for n in range(batch):
            boxes = np.concatenate([lvl["boxes"][n] for lvl in levels])
            scores = np.concatenate([lvl["scores"][n] for lvl in levels])
            labels = np.concatenate([lvl["labels"][n] for lvl in levels])
            keep = scores > self.score_threshold
            boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
            kept = nms(boxes, scores, labels)[:100]
            results.append({"boxes": boxes[kept].astype(np.float32),
                            "scores": scores[kept].astype(np.float32),
                            "labels": labels[kept].astype(np.int64)})
        return results


class IntegratedDetectionSystem:
    """Dehazing router ∘ frozen detector with ImageNet renormalisation
    (reference: models/detection.py:74-125)."""

    def __init__(self, dehaze_fn: Callable, detection_model: DetectionModel):
        """dehaze_fn: hazy (N,H,W,3) in [0,1] -> (dehazed, info)."""
        self.dehaze_fn = dehaze_fn
        self.detection_model = detection_model

    def __call__(self, images: jax.Array):
        dehazed, _info = self.dehaze_fn(images)
        normalized = (dehazed - IMAGENET_MEAN) / IMAGENET_STD
        detections = self.detection_model(normalized)
        return detections, dehazed


def create_detection_model(config) -> DetectionModel:
    """(reference: models/detection.py:127-133)"""
    dtype = jnp.dtype(config.get("tpu", {}).get("compute_dtype", "float32"))
    pretrained = config["detection"].get("pretrained")
    return DetectionModel(
        num_classes=config["detection"].get("num_classes", 91),
        model_name=config["detection"]["model"],
        score_threshold=config["detection"].get("score_threshold", 0.05),
        dtype=dtype,
        # Reference semantics: `pretrained: true` means torchvision COCO
        # weights; here it must be a PATH to the converted orbax checkpoint
        # (a bare true has nothing to load from in this environment).
        pretrained=pretrained if isinstance(pretrained, str) else None,
        p2=bool(config["detection"].get("p2", False)),
    )


def create_integrated_system(dehaze_fn, detection_model) -> IntegratedDetectionSystem:
    """(reference: models/detection.py:135-140)"""
    return IntegratedDetectionSystem(dehaze_fn, detection_model)
