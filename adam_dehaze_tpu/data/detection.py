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
                 image_source: str = "hazy"):
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
        # Fused native u8 -> ImageNet-normalised float32 (one pass).
        img = normalize_u8(raw, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                           n_threads=1)
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
                             shard_per_host: bool = True) -> DataLoader:
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
    )
    loader = DataLoader(
        ds, batch_size=max(config["dataset"]["batch_size"] // 2, 1),
        shuffle=False, num_workers=config["dataset"]["num_workers"],
        drop_remainder=False)
    if not shard_per_host:
        return loader
    from adam_dehaze_tpu.parallel.multihost import shard_loader_for_host
    return shard_loader_for_host(loader)
