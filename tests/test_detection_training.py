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
