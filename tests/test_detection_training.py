import jax
import pytest
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.models.detection import FCOSDetector
from adam_dehaze_tpu.training.train_detection import (
    _assign_level,
    fcos_loss,
    make_detection_train_step,
    sigmoid_focal_loss,
)
from adam_dehaze_tpu.training.state import TrainState, make_optimizer


def test_focal_loss_basics():
    logits = jnp.array([[10.0, -10.0]])
    targets = jnp.array([[1.0, 0.0]])
    loss = sigmoid_focal_loss(logits, targets)
    assert float(loss.sum()) < 1e-3  # confident & correct -> tiny loss
    bad = sigmoid_focal_loss(-logits, targets)
    assert float(bad.sum()) > 1.0


def test_assign_level_simple():
    # One 32x32 box at (8, 8)-(40, 40) on an 8x8 map of stride 8.
    boxes = jnp.array([[8.0, 8.0, 40.0, 40.0], [0, 0, 0, 0]])
    labels = jnp.array([5, 0])
    cls_t, box_t, ctr_t, pos = _assign_level(
        boxes, labels, jnp.int32(1), 8, 8, 8, (0.0, 64.0), 10)
    assert cls_t.shape == (8, 8, 10)
    # Cell (2, 2) has center (20, 20): inside the box.
    assert bool(pos[2, 2])
    assert int(jnp.argmax(cls_t[2, 2])) == 5
    # Cell (7, 7) center (60, 60): outside.
    assert not bool(pos[7, 7])
    # Offsets at (2,2): l = 20-8 = 12, r = 40-20 = 20.
    np.testing.assert_allclose(np.asarray(box_t[2, 2]), [12, 12, 20, 20])
    assert 0 < float(ctr_t[2, 2]) <= 1


@pytest.mark.slow
def test_fcos_loss_and_train_step(key):
    module = FCOSDetector(num_classes=6, backbone_name="fcos_resnet18_fpn",
                          channels=16)
    x = jax.random.uniform(key, (2, 64, 64, 3))
    variables = module.init(key, x)
    outs = module.apply(variables, x)
    boxes = jnp.tile(jnp.array([[[4.0, 4.0, 30.0, 30.0]]]), (2, 4, 1))
    labels = jnp.ones((2, 4), jnp.int32) * 2
    n_boxes = jnp.ones((2,), jnp.int32)
    losses = fcos_loss(outs, boxes, labels, n_boxes, 6)
    assert jnp.isfinite(losses["total"])
    assert float(losses["n_pos"]) > 0

    tx = make_optimizer(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_detection_train_step(module, tx)
    batch = {"hazy": x, "boxes": boxes, "labels": labels, "n_boxes": n_boxes}
    l0 = None
    for _ in range(5):
        state, losses = step(state, batch)
        if l0 is None:
            l0 = float(losses["total"])
    assert float(losses["total"]) < l0  # optimisation makes progress


def test_center_sampling_excludes_edge_cells():
    """A wide box covers many cells, but only those within 1.5*stride of the
    box center stay positive (FCOS-improvements center sampling)."""
    from adam_dehaze_tpu.training.train_detection import _assign_level

    # 64x64-px box spanning cells (0..7, 0..7) on a stride-8 map.
    boxes = jnp.array([[0.0, 0.0, 64.0, 64.0]])
    labels = jnp.array([3])
    _, _, _, pos = _assign_level(boxes, labels, jnp.int32(1), 8, 8, 8,
                                 (0.0, 64.0), 10)
    # Center is (32, 32); radius 1.5 * 8 = 12 px -> cell centers in
    # [20, 44], i.e. grid indices 2..5 only.
    assert bool(pos[3, 3])
    assert not bool(pos[0, 0])  # inside the box but far from its center
    assert not bool(pos[7, 7])
    # Radius large enough -> every inside cell positive again.
    _, _, _, pos_all = _assign_level(boxes, labels, jnp.int32(1), 8, 8, 8,
                                     (0.0, 64.0), 10, center_radius=100.0)
    assert bool(pos_all[0, 0])


def test_giou_loss_properties():
    from adam_dehaze_tpu.training.train_detection import _giou_loss

    t = jnp.array([[4.0, 4.0, 4.0, 4.0]])
    # Perfect prediction -> loss 0.
    np.testing.assert_allclose(np.asarray(_giou_loss(t, t)), [0.0], atol=1e-5)
    # Worse overlap -> larger loss; GIoU stays bounded in [0, 2].
    near = jnp.array([[3.0, 3.0, 5.0, 5.0]])
    far = jnp.array([[0.5, 0.5, 12.0, 12.0]])
    l_near = float(_giou_loss(near, t)[0])
    l_far = float(_giou_loss(far, t)[0])
    assert 0 < l_near < l_far < 2.0


def test_detection_augmentation_boxes_consistent(tmp_path):
    """Flip/scale/crop keep (image, boxes) consistent: a white square's box
    still covers bright pixels after augmentation, and shapes stay static."""
    import cv2
    import os
    from adam_dehaze_tpu.data.detection import (DetectionDataset,
                                                IMAGENET_MEAN, IMAGENET_STD)

    root = tmp_path / "corpus"
    hazy = root / "test" / "low" / "hazy"
    ann_dir = root / "annotations"
    os.makedirs(hazy); os.makedirs(ann_dir)
    img = np.zeros((64, 64, 3), np.uint8)
    img[20:40, 8:28] = 255
    cv2.imwrite(str(hazy / "im0.png"), img)
    import json
    coco = {"annotations": [{"image_id": 0, "bbox": [8, 20, 20, 20],
                             "category_id": 1}],
            "images": [{"id": 0, "file_name": "im0.png"}]}
    with open(ann_dir / "instances.json", "w") as f:
        json.dump(coco, f)

    ds = DetectionDataset(str(root), str(ann_dir), split="test", img_size=64,
                          max_boxes=4, augment=True, seed=0)
    seen_change = False
    base = None
    for epoch in range(6):
        ds.epoch = epoch
        item = ds.load(0)
        assert item["hazy"].shape == (64, 64, 3)  # static canvas
        n = int(item["n_boxes"])
        assert n in (0, 1)
        if n:
            x1, y1, x2, y2 = item["boxes"][0]
            assert 0 <= x1 < x2 <= 64 and 0 <= y1 < y2 <= 64
            # Denormalise and check the box interior is bright on average.
            rgb = item["hazy"] * IMAGENET_STD + IMAGENET_MEAN
            inside = rgb[int(y1) + 1:int(y2) - 1, int(x1) + 1:int(x2) - 1]
            if inside.size:
                assert float(inside.mean()) > 0.5
        if base is None:
            base = item["hazy"].copy()
        elif not np.allclose(item["hazy"], base):
            seen_change = True
    assert seen_change  # augmentation actually varies across epochs

    # Determinism: same (seed, epoch, idx) -> same sample.
    ds.epoch = 2
    a = ds.load(0)
    b = ds.load(0)
    np.testing.assert_array_equal(a["hazy"], b["hazy"])
    np.testing.assert_array_equal(a["boxes"], b["boxes"])


def test_fcos_loss_four_levels(key):
    """fcos_loss adapts its assignment ranges to a 4-level (P2) pyramid;
    a small box (<32 px) produces positives only on the stride-4 level."""
    import jax

    from adam_dehaze_tpu.models.detection import FCOSDetector
    from adam_dehaze_tpu.training.train_detection import (
        fcos_loss,
        level_ranges,
    )

    assert len(level_ranges(4)) == 4 and level_ranges(4)[0][1] == 32.0
    m = FCOSDetector(num_classes=4, backbone_name="fcos_resnet18_fpn",
                     channels=32, p2=True)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(key, x)
    outs = m.apply(vars_, x)
    boxes = jnp.asarray([[[24.0, 24.0, 44.0, 44.0]]])  # 20px box
    labels = jnp.asarray([[1]])
    n_boxes = jnp.asarray([1])
    losses = fcos_loss(outs, boxes, labels, n_boxes, 4)
    assert all(bool(jnp.isfinite(v)) for v in losses.values())
    # the 20px box (max offset < 32) must assign to the stride-4 level only
    from adam_dehaze_tpu.training.train_detection import _assign_level
    for lvl, rng in zip(outs, level_ranges(4)):
        h, w = lvl["logits"].shape[1:3]
        _, _, _, pos = jax.vmap(
            lambda bx, lb, nb: _assign_level(
                bx, lb, nb, h, w, lvl["stride"], rng, 4))(
                    boxes, labels, n_boxes)
        if lvl["stride"] == 4:
            assert int(pos.sum()) > 0
        else:
            assert int(pos.sum()) == 0
