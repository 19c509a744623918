"""The detection fine-tune driver runs end-to-end on a tiny dataset."""
import json
import os

import numpy as np
import pytest

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.data.preprocessing import generate_synthetic_dataset


@pytest.fixture(scope="module")
def det_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("det_train"))
    generate_synthetic_dataset(root, n_per_class=4, size=64, seed=9)
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(ann_dir)
    coco = {
        "images": [],
        "annotations": [{"id": 1, "image_id": 0, "category_id": 1,
                         "bbox": [4, 4, 24, 24], "area": 576, "iscrowd": 0}],
        "categories": [{"id": 1}],
    }
    with open(os.path.join(ann_dir, "instances.json"), "w") as f:
        json.dump(coco, f)
    return root


@pytest.mark.slow
def test_train_detection_driver(det_root, tmp_path):
    from adam_dehaze_tpu.training.train_detection import train_detection

    cfg = default_config()
    cfg["dataset"].update(test_path=det_root, batch_size=4, num_workers=2)
    cfg["detection"].update(model="fcos_resnet18_fpn", num_classes=6)
    cfg["detection"]["checkpoint_dir"] = str(tmp_path / "ck")
    cfg["_logs_dir"] = str(tmp_path / "logs")
    cfg["tpu"].update(use_pallas=False, compute_dtype="float32")
    det, state = train_detection(cfg, epochs=1, img_size=64)
    assert os.path.isdir(os.path.join(cfg["detection"]["checkpoint_dir"],
                                      "best_model"))
    # The trained model still produces valid inference output.
    import jax.numpy as jnp
    results = det(jnp.zeros((1, 64, 64, 3)))
    assert set(results[0]) == {"boxes", "scores", "labels"}

    # Regression: the evaluator restores the trainer's FULL train-state tree
    # (step/params/batch_stats/opt_state) untargeted and takes the inference
    # subset — a {params, batch_stats} target mismatches orbax's on-disk
    # structure (evaluate.py:211-219).
    from adam_dehaze_tpu.models.detection import create_detection_model
    from adam_dehaze_tpu.training import checkpoint as ckpt

    best = ckpt.best_model_path(cfg["detection"]["checkpoint_dir"])
    tree, _ = ckpt.load_checkpoint(best)
    assert {"params", "batch_stats"} <= set(tree)
    import jax

    det2 = create_detection_model(cfg)
    det2.init(jax.random.PRNGKey(1), image_size=64)
    det2.variables = {"params": tree["params"],
                      "batch_stats": tree["batch_stats"]}
    results2 = det2(jnp.zeros((1, 64, 64, 3)))
    assert set(results2[0]) == {"boxes", "scores", "labels"}
