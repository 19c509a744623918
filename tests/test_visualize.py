"""Visualization utilities write valid PNGs."""
import json
import os

import numpy as np

from adam_dehaze_tpu.utils import visualize


def test_visualize_suite(tmp_path, rng):
    imgs = rng.random((2, 16, 16, 3)).astype(np.float32)
    p1 = str(tmp_path / "cmp.png")
    visualize.visualize_comparison(imgs, imgs, imgs, p1)
    p2 = str(tmp_path / "det.png")
    visualize.visualize_detections(
        imgs[0], {"boxes": np.array([[2, 2, 10, 10]]),
                  "scores": np.array([0.9]), "labels": np.array([3])}, p2)
    p3 = str(tmp_path / "route.png")
    visualize.visualize_routing_weights(
        np.array([[0.2, 0.3, 0.5], [0.6, 0.3, 0.1]]), p3)
    p4 = str(tmp_path / "montage.png")
    visualize.visualize_montage(list(imgs), p4, ncols=2, titles=["a", "b"])
    p5 = str(tmp_path / "summary.png")
    visualize.plot_summary_chart({"psnr": 24.0, "ssim": 0.9}, p5)

    jsonl = tmp_path / "metrics.jsonl"
    with open(jsonl, "w") as f:
        for step in range(3):
            f.write(json.dumps({"step": step, "train/loss": 1.0 / (step + 1),
                                "val/loss": 2.0 / (step + 1)}) + "\n")
    p6 = str(tmp_path / "curves.png")
    visualize.plot_training_curves(str(jsonl), p6)

    for p in (p1, p2, p3, p4, p5, p6):
        assert os.path.getsize(p) > 500
