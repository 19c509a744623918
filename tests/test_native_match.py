"""Parity between the C++ COCO matcher (native/coco_match.cpp) and the
pure-Python fallback."""
import numpy as np
import pytest

from adam_dehaze_tpu.evaluation import coco_eval


@pytest.fixture(scope="module")
def native_lib():
    lib = coco_eval._load_native()
    if lib is None:
        pytest.skip("native matcher not buildable (no g++?)")
    return lib


def test_native_matches_python(native_lib, rng):
    for trial in range(30):
        n_det = int(rng.integers(1, 15))
        n_gt = int(rng.integers(1, 10))
        ious = rng.random((n_det, n_gt))
        scores = rng.random(n_det)
        gt_ig = rng.random(n_gt) < 0.3
        gt_cr = rng.random(n_gt) < 0.2
        a_dtm, a_ig = coco_eval._match_image_py(scores, ious, gt_ig, gt_cr, 10)
        b_dtm, b_ig = coco_eval._match_image_native(
            native_lib, scores, ious, gt_ig, gt_cr, 10)
        np.testing.assert_array_equal(a_dtm, b_dtm, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(a_ig, b_ig, err_msg=f"trial {trial}")


def test_evaluator_uses_native_transparently(native_lib):
    gt = {
        "images": [{"id": 1}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "bbox": [0, 0, 10, 10], "area": 100, "iscrowd": 0}],
        "categories": [{"id": 1}],
    }
    res = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10],
            "score": 0.9}]
    stats = coco_eval.COCOEvaluator(gt).evaluate(res)
    np.testing.assert_allclose(stats["mAP"], 1.0, atol=1e-6)
