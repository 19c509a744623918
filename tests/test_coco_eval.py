import numpy as np

from adam_dehaze_tpu.evaluation.coco_eval import (
    COCOEvaluator,
    box_iou_xywh,
)


def _gt(images, anns, cats=(1, 2)):
    return {
        "images": [{"id": i} for i in images],
        "annotations": [
            {"id": k, "image_id": a[0], "category_id": a[1],
             "bbox": list(a[2]), "area": a[2][2] * a[2][3], "iscrowd": 0}
            for k, a in enumerate(anns)
        ],
        "categories": [{"id": c} for c in cats],
    }


def test_iou():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[0, 0, 10, 10], [5, 5, 10, 10], [20, 20, 5, 5]], float)
    iou = box_iou_xywh(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0)
    np.testing.assert_allclose(iou[0, 2], 0.0)


def test_perfect_detections_give_map_1():
    gt = _gt([1, 2], [(1, 1, (10, 10, 40, 40)), (2, 1, (5, 5, 50, 50)),
                      (2, 2, (60, 60, 30, 30))])
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 40, 40], "score": 0.9},
        {"image_id": 2, "category_id": 1, "bbox": [5, 5, 50, 50], "score": 0.8},
        {"image_id": 2, "category_id": 2, "bbox": [60, 60, 30, 30], "score": 0.95},
    ]
    stats = COCOEvaluator(gt).evaluate(results)
    np.testing.assert_allclose(stats["mAP"], 1.0, atol=1e-6)
    np.testing.assert_allclose(stats["mAP_50"], 1.0, atol=1e-6)
    np.testing.assert_allclose(stats["AR_100"], 1.0, atol=1e-6)


def test_no_detections_zero_map():
    gt = _gt([1], [(1, 1, (10, 10, 40, 40))])
    stats = COCOEvaluator(gt).evaluate([])
    assert stats["mAP"] == 0.0
    assert stats["AR_100"] == 0.0


def test_false_positives_lower_precision():
    gt = _gt([1], [(1, 1, (10, 10, 40, 40))], cats=(1,))
    perfect = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 40, 40],
                "score": 0.9}]
    with_fp = perfect + [
        {"image_id": 1, "category_id": 1, "bbox": [200, 200, 20, 20],
         "score": 0.95},  # higher-scored FP hurts
    ]
    s1 = COCOEvaluator(gt).evaluate(perfect)
    s2 = COCOEvaluator(gt).evaluate(with_fp)
    assert s2["mAP"] < s1["mAP"]


def test_localisation_quality_affects_high_iou_only():
    gt = _gt([1], [(1, 1, (10, 10, 40, 40))], cats=(1,))
    # ~IoU 0.68 detection: counts at IoU .5 but not .75.
    res = [{"image_id": 1, "category_id": 1, "bbox": [16, 16, 40, 40],
            "score": 0.9}]
    s = COCOEvaluator(gt).evaluate(res)
    assert s["mAP_50"] == 1.0
    assert s["mAP_75"] == 0.0
    assert 0 < s["mAP"] < 1


def test_area_buckets():
    # One small (16x16=256 < 1024) and one large (128x128) object.
    gt = _gt([1], [(1, 1, (0, 0, 16, 16)), (1, 1, (50, 50, 128, 128))],
             cats=(1,))
    res = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 16, 16], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 128, 128], "score": 0.8},
    ]
    s = COCOEvaluator(gt).evaluate(res)
    np.testing.assert_allclose(s["mAP_small"], 1.0, atol=1e-6)
    np.testing.assert_allclose(s["mAP_large"], 1.0, atol=1e-6)
    assert s["mAP_medium"] == -1.0  # no medium GT -> excluded


def test_ar_maxdets():
    # 3 GTs, detector only allowed 1 det for AR_1.
    gt = _gt([1], [(1, 1, (0, 0, 20, 20)), (1, 1, (40, 0, 20, 20)),
                   (1, 1, (80, 0, 20, 20))], cats=(1,))
    res = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [40, 0, 20, 20], "score": 0.8},
        {"image_id": 1, "category_id": 1, "bbox": [80, 0, 20, 20], "score": 0.7},
    ]
    s = COCOEvaluator(gt).evaluate(res)
    np.testing.assert_allclose(s["AR_1"], 1.0 / 3.0, atol=1e-6)
    np.testing.assert_allclose(s["AR_100"], 1.0, atol=1e-6)
