"""Detection dataset: hazy images + COCO-format boxes.

Counterpart of the reference's DetectionDataset
(reference: data/dataset.py:126-231): walks {split}/{intensity}/hazy,
pairs each image with a per-image or shared `instances.json` annotation,
resizes to a square detection resolution and applies ImageNet normalisation.
Batches stay static-shape: boxes are padded to `max_boxes` with a validity
count per image (XLA-friendly), unlike the reference's ragged list collate
(reference: data/dataset.py:269-282).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from adam_dehaze_tpu.data.dataset import DataLoader, _imread_rgb

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DetectionDataset:
    """Samples: {image (normalised), boxes xyxy, labels, n_boxes, name,
    intensity}."""

    def __init__(self, root_dir: str, annotation_dir: str, split: str = "test",
                 img_size: int = 512, max_boxes: int = 64,
                 image_source: str = "hazy", augment: bool = False,
                 seed: int = 0):
        """image_source: which triplet member to feed the detector. "hazy" for
        evaluation (the degraded input the system sees); "clear" for detector
        fine-tuning — the reference's detector is COCO-pretrained on natural
        clean images (reference: models/detection.py:23-51), so the TPU
        analogue trains on clean frames and haze is then out-of-distribution
        (that is what the dehazed-vs-hazy mAP comparison measures). Falls back
        per-image to hazy when a clear counterpart doesn't exist."""
        self.root_dir = os.path.join(root_dir, split)
        self.annotation_dir = annotation_dir
        self.img_size = img_size
        self.max_boxes = max_boxes
        # Training-time augmentation (host side, static canvas — every
        # variant keeps the same (img_size, img_size) shape so XLA compiles
        # the train step exactly once; multi-scale comes from rescaling the
        # CONTENT inside the fixed canvas, not from resizing the canvas).
        self.augment = augment
        self.seed = seed
        self.epoch = 0  # trainer bumps this; per-item rng = f(seed, epoch, idx)
        self.samples: List[Dict] = []
        for intensity in ("low", "medium", "high"):
            hazy_dir = os.path.join(self.root_dir, intensity, "hazy")
            if not os.path.isdir(hazy_dir):
                continue
            for name in sorted(os.listdir(hazy_dir)):
                if not name.endswith((".jpg", ".png")):
                    continue
                base = os.path.splitext(name)[0]
                ann = os.path.join(self.annotation_dir, f"{base}.json")
                if not os.path.exists(ann):
                    ann = os.path.join(self.annotation_dir, "instances.json")
                if not os.path.exists(ann):
                    continue
                path = os.path.join(hazy_dir, name)
                if image_source == "clear":
                    clear = os.path.join(self.root_dir, intensity, "clear",
                                         name)
                    if os.path.exists(clear):
                        path = clear
                self.samples.append({
                    "hazy": path,
                    "annotation": ann, "name": name,
                    "intensity": intensity,
                })
        print(f"Loaded {len(self.samples)} samples for detection evaluation")

    def __len__(self):
        return len(self.samples)

    def _augment(self, raw, boxes, labels, idx: int):
        """Deterministic per-(seed, epoch, idx) train-time augmentation.

        Scale jitter rescales the CONTENT and pastes/crops it on the fixed
        (img_size, img_size) canvas — multi-scale training without multiple
        XLA programs (a resized canvas would trigger one remote compile per
        size on axon). Plus horizontal flip and a mild photometric gain so
        the clear-trained detector generalises to dehazed outputs, whose
        global brightness differs slightly from ground-truth clear frames.
        """
        import cv2

        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self.epoch) * 1_000_003 + idx)
        size = self.img_size
        b = np.asarray(boxes, np.float32).reshape(-1, 4)
        lb = np.asarray(labels, np.int64).reshape(-1)

        if rng.random() < 0.5:  # horizontal flip
            raw = np.ascontiguousarray(raw[:, ::-1])
            b = np.stack([size - b[:, 2], b[:, 1],
                          size - b[:, 0], b[:, 3]], axis=1)

        scale = float(rng.uniform(0.6, 1.2))
        new = max(32, int(round(size * scale)))
        if new != size:
            content = cv2.resize(raw, (new, new))
            b = b * (new / size)
            if new < size:  # paste small content at a random offset
                ox = int(rng.integers(0, size - new + 1))
                oy = int(rng.integers(0, size - new + 1))
                canvas = np.full((size, size, 3),
                                 raw.mean(axis=(0, 1)), np.uint8)
                canvas[oy:oy + new, ox:ox + new] = content
                raw = canvas
                b = b + np.array([ox, oy, ox, oy], np.float32)
            else:  # random-crop a full-size window out of bigger content
                ox = int(rng.integers(0, new - size + 1))
                oy = int(rng.integers(0, new - size + 1))
                raw = np.ascontiguousarray(
                    content[oy:oy + size, ox:ox + size])
                area0 = np.maximum(
                    (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]), 1e-6)
                b = b - np.array([ox, oy, ox, oy], np.float32)
                b = np.stack([b[:, 0].clip(0, size), b[:, 1].clip(0, size),
                              b[:, 2].clip(0, size), b[:, 3].clip(0, size)],
                             axis=1)
                vis = (b[:, 2] - b[:, 0]).clip(0) * \
                    (b[:, 3] - b[:, 1]).clip(0)
                keep = vis / area0 >= 0.25
                b, lb = b[keep], lb[keep]

        gain = float(rng.uniform(0.9, 1.1))
        if abs(gain - 1.0) > 1e-3:
            raw = np.clip(raw.astype(np.float32) * gain, 0, 255) \
                .astype(np.uint8)
        return raw, b.tolist(), lb.tolist()

    def load(self, idx: int) -> Dict:
        s = self.samples[idx]
        import cv2

        from adam_dehaze_tpu.data.native_collate import normalize_u8
        raw = cv2.imread(s["hazy"])
        if raw is None:
            raise FileNotFoundError(s["hazy"])
        oh, ow = raw.shape[:2]
        sx, sy = self.img_size / ow, self.img_size / oh
        raw = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
        if (oh, ow) != (self.img_size, self.img_size):
            raw = cv2.resize(raw, (self.img_size, self.img_size))
        with open(s["annotation"]) as f:
            ann = json.load(f)
        boxes, labels = [], []
        for obj in ann.get("annotations", []):
            x, y, w, h = obj["bbox"]
            # bbox is in original-image pixels; rescale to the square
            # detection resolution (reference resizes to 512 the same way,
            # data/dataset.py:131-160).
            boxes.append([x * sx, y * sy, (x + w) * sx, (y + h) * sy])
            labels.append(obj["category_id"])
        if self.augment:
            raw, boxes, labels = self._augment(raw, boxes, labels, idx)
        # Fused native u8 -> ImageNet-normalised float32 (one pass).
        img = normalize_u8(raw, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                           n_threads=1)
        boxes_arr = np.zeros((self.max_boxes, 4), np.float32)
        labels_arr = np.zeros((self.max_boxes,), np.int32)
        n = min(len(boxes), self.max_boxes)
        if n:
            boxes_arr[:n] = np.asarray(boxes[:n], np.float32)
            labels_arr[:n] = np.asarray(labels[:n], np.int32)
        return {
            "hazy": img,
            "clear": img,      # keep the triplet collate contract
            "dehazed": img,
            "boxes": boxes_arr,
            "labels": labels_arr,
            "n_boxes": np.int32(n),
            "intensity": np.int32({"low": 0, "medium": 1, "high": 2}[s["intensity"]]),
            "name": s["name"],
        }


def get_detection_dataloader(config, split: str = "test",
                             img_size: int = 512,
                             image_source: str = "hazy",
                             shard_per_host: bool = True,
                             augment: bool = False,
                             shuffle: bool = False) -> DataLoader:
    """(reference: data/dataset.py:251-267; 512 is its fixed detection
    resolution, overridable here). `shard_per_host=False` gives every host
    the full dataset (evaluation entry points use it so COCO scoring sees
    all detections, not a shard)."""
    key = {"train": "train_path", "val": "val_path"}.get(split, "test_path")
    root = config["dataset"][key]
    ds = DetectionDataset(
        root_dir=root,
        annotation_dir=os.path.join(root, "annotations"),
        split=split,
        img_size=img_size,
        image_source=image_source,
        augment=augment,
        seed=config.get("seed", 0),
    )
    loader = DataLoader(
        ds, batch_size=max(config["dataset"]["batch_size"] // 2, 1),
        shuffle=shuffle, num_workers=config["dataset"]["num_workers"],
        drop_remainder=shuffle)
    if not shard_per_host:
        return loader
    from adam_dehaze_tpu.parallel.multihost import shard_loader_for_host
    return shard_loader_for_host(loader)
