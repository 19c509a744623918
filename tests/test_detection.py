import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.models.detection import (
    DetectionModel,
    FCOSDetector,
    create_detection_model,
    create_integrated_system,
    decode_detections,
    nms,
)


def test_fcos_forward_shapes(key):
    m = FCOSDetector(num_classes=11, backbone_name="fcos_resnet18_fpn",
                     channels=32)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(key, x)
    outs = m.apply(vars_, x)
    assert len(outs) == 3
    # strides 8, 16, 32 over a 64px input.
    assert outs[0]["logits"].shape == (1, 8, 8, 11)
    assert outs[1]["logits"].shape == (1, 4, 4, 11)
    assert outs[2]["logits"].shape == (1, 2, 2, 11)
    assert outs[0]["offsets"].shape == (1, 8, 8, 4)
    assert float(outs[0]["offsets"].min()) >= 0.0  # softplus offsets


def test_nms_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], float)
    scores = np.array([0.9, 0.8, 0.7])
    labels = np.array([1, 1, 1])
    keep = nms(boxes, scores, labels, iou_threshold=0.5)
    assert list(keep) == [0, 2]
    # Different labels are not suppressed.
    keep2 = nms(boxes, scores, np.array([1, 2, 1]), iou_threshold=0.5)
    assert list(keep2) == [0, 1, 2]


def test_decode_detections_synthetic():
    # One confident location at level 0.
    logits = np.full((1, 4, 4, 5), -10.0, np.float32)
    logits[0, 1, 2, 3] = 8.0  # class 3 at cell (1,2)
    offsets = np.full((1, 4, 4, 4), 5.0, np.float32)
    ctr = np.full((1, 4, 4, 1), 8.0, np.float32)
    outs = [{"logits": logits, "offsets": offsets, "centerness": ctr,
             "stride": 8}]
    res = decode_detections(outs, score_threshold=0.5)
    assert len(res) == 1
    assert len(res[0]["boxes"]) == 1
    assert res[0]["labels"][0] == 3
    # Center of cell (1,2) at stride 8 = (20, 12); box = center ± 5.
    np.testing.assert_allclose(res[0]["boxes"][0], [15, 7, 25, 17], atol=1e-4)


def test_detection_model_end_to_end(key):
    cfg = default_config()
    cfg["detection"]["model"] = "fcos_resnet18_fpn"
    cfg["tpu"]["compute_dtype"] = "float32"
    model = create_detection_model(cfg)
    model.init(key, image_size=64)
    images = jnp.zeros((2, 64, 64, 3))
    results = model(images)
    assert len(results) == 2
    for r in results:
        assert set(r) == {"boxes", "scores", "labels"}
        assert r["boxes"].shape[1:] == (4,) or r["boxes"].shape == (0, 4)


def test_integrated_system(key):
    cfg = default_config()
    cfg["detection"]["model"] = "fcos_resnet18_fpn"
    cfg["tpu"]["compute_dtype"] = "float32"
    det = create_detection_model(cfg)
    det.init(key, image_size=32)

    def fake_dehaze(x):
        return jnp.clip(x * 1.1, 0, 1), {}

    system = create_integrated_system(fake_dehaze, det)
    images = jnp.full((1, 32, 32, 3), 0.5)
    detections, dehazed = system(images)
    assert len(detections) == 1
    np.testing.assert_allclose(np.asarray(dehazed),
                               np.full((1, 32, 32, 3), 0.55), atol=1e-5)


def test_fcos_forward_shapes_p2(key):
    """p2=True extends the native pyramid down to stride 4
    (models/detection.py FCOSDetector.p2 — small-object dial)."""
    m = FCOSDetector(num_classes=11, backbone_name="fcos_resnet18_fpn",
                     channels=32, p2=True)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(key, x)
    outs = m.apply(vars_, x)
    assert len(outs) == 4
    assert [o["stride"] for o in outs] == [4, 8, 16, 32]
    assert outs[0]["logits"].shape == (1, 16, 16, 11)
    assert outs[3]["logits"].shape == (1, 2, 2, 11)
