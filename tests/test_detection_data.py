import json
import os

import numpy as np
import pytest

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.data.detection import DetectionDataset, get_detection_dataloader
from adam_dehaze_tpu.data.preprocessing import generate_synthetic_dataset


@pytest.fixture(scope="module")
def det_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("det"))
    generate_synthetic_dataset(root, n_per_class=4, size=32, seed=2)
    # Shared instances.json with a couple of boxes.
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(ann_dir)
    coco = {
        "images": [],
        "annotations": [
            {"id": 1, "image_id": 0, "category_id": 1, "bbox": [2, 2, 10, 10],
             "area": 100, "iscrowd": 0},
            {"id": 2, "image_id": 0, "category_id": 3, "bbox": [15, 15, 8, 8],
             "area": 64, "iscrowd": 0},
        ],
        "categories": [{"id": i} for i in range(1, 5)],
    }
    with open(os.path.join(ann_dir, "instances.json"), "w") as f:
        json.dump(coco, f)
    return root


def test_detection_dataset(det_root):
    ds = DetectionDataset(det_root, os.path.join(det_root, "annotations"),
                          split="test", img_size=32, max_boxes=8)
    assert len(ds) > 0
    item = ds.load(0)
    assert item["hazy"].shape == (32, 32, 3)
    # ImageNet-normalised: values outside [0,1] are expected.
    assert item["hazy"].min() < 0
    assert item["boxes"].shape == (8, 4)
    assert int(item["n_boxes"]) == 2
    np.testing.assert_allclose(item["boxes"][0], [2, 2, 12, 12])
    assert item["labels"][1] == 3


def test_detection_dataloader(det_root):
    cfg = default_config()
    cfg["dataset"]["test_path"] = det_root
    cfg["dataset"]["batch_size"] = 4
    cfg["dataset"]["num_workers"] = 2
    dl = get_detection_dataloader(cfg)
    batch = next(iter(dl))
    assert batch["hazy"].shape[0] == 2  # batch_size // 2
    assert batch["boxes"].shape == (2, 64, 4)
    assert batch["n_boxes"].shape == (2,)
    assert len(batch["name"]) == 2
