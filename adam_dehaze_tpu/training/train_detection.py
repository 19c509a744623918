"""Detection fine-tuning (FCOS losses + trainer).

The reference exposes `detection.fine_tune` / learning-rate config
(reference: config/config.yaml:63-72) but never actually trains its detector
(only inference in evaluate.py). Here fine-tuning is implemented for the
TPU-native FCOS detector: anchor-free target assignment, sigmoid focal
classification loss, IoU regression loss on positives, and BCE centerness —
all static-shape and batched under one jitted step.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adam_dehaze_tpu.data.detection import get_detection_dataloader
from adam_dehaze_tpu.models.detection import FCOSDetector, create_detection_model
from adam_dehaze_tpu.training import checkpoint as ckpt
from adam_dehaze_tpu.training.common import device_batch, state_to_tree
from adam_dehaze_tpu.training.logging import MetricsLogger
from adam_dehaze_tpu.training.state import TrainState, make_optimizer

# Per-level max-offset ranges (stride 8, 16, 32).
_LEVEL_RANGES = ((0.0, 64.0), (64.0, 128.0), (128.0, 1e8))
# With the P2 small-object level (stride 4, models/detection.py p2=True)
# the ranges shift down one octave so sub-32 px boxes assign to P2.
_LEVEL_RANGES_P2 = ((0.0, 32.0), (32.0, 64.0), (64.0, 128.0), (128.0, 1e8))


def level_ranges(n_levels: int):
    """Assignment ranges matching the model's pyramid (3 native levels, or
    4 with p2)."""
    return _LEVEL_RANGES_P2 if n_levels == 4 else _LEVEL_RANGES


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25,
                       gamma: float = 2.0):
    """Per-element focal loss; targets are {0,1} one-hot maps."""
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def _assign_level(boxes, labels, n_boxes, h, w, stride, level_range,
                  num_classes, center_radius: float = 1.5):
    """FCOS target assignment for one pyramid level.

    boxes: (M, 4) xyxy padded; labels: (M,); n_boxes: scalar.
    Returns (cls_target (H, W, C), box_target (H, W, 4), ctr_target (H, W),
             pos_mask (H, W)).

    Center sampling (FCOS-improvements): a location is positive only if it
    also lies within `center_radius * stride` of the box center, which keeps
    low-centerness edge locations out of the positive set — markedly better
    assignment when boxes overlap (the torchvision FCOS the reference's
    detector family ships uses the same rule, radius 1.5).
    """
    ys = (jnp.arange(h) + 0.5) * stride
    xs = (jnp.arange(w) + 0.5) * stride
    cy, cx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)

    m = boxes.shape[0]
    valid = jnp.arange(m) < n_boxes
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # Offsets (H, W, M)
    l = cx[..., None] - x1
    t = cy[..., None] - y1
    r = x2 - cx[..., None]
    b = y2 - cy[..., None]
    ltrb = jnp.stack([l, t, r, b], axis=-1)  # (H, W, M, 4)
    inside = jnp.min(ltrb, axis=-1) > 0
    max_off = jnp.max(ltrb, axis=-1)
    in_range = (max_off >= level_range[0]) & (max_off <= level_range[1])
    bcx = 0.5 * (x1 + x2)
    bcy = 0.5 * (y1 + y2)
    rad = center_radius * stride
    near_center = (jnp.abs(cx[..., None] - bcx) <= rad) & \
        (jnp.abs(cy[..., None] - bcy) <= rad)
    candidate = inside & near_center & in_range & valid[None, None, :]

    area = (x2 - x1) * (y2 - y1)
    big = 1e18
    cand_area = jnp.where(candidate, area[None, None, :], big)
    best = jnp.argmin(cand_area, axis=-1)  # (H, W)
    pos = jnp.min(cand_area, axis=-1) < big

    best_ltrb = jnp.take_along_axis(
        ltrb, best[..., None, None], axis=2)[:, :, 0, :]  # (H, W, 4)
    best_label = labels[best]  # (H, W)

    cls_target = jax.nn.one_hot(jnp.where(pos, best_label, 0), num_classes)
    cls_target = cls_target * pos[..., None]

    lr_min = jnp.minimum(best_ltrb[..., 0], best_ltrb[..., 2])
    lr_max = jnp.maximum(best_ltrb[..., 0], best_ltrb[..., 2])
    tb_min = jnp.minimum(best_ltrb[..., 1], best_ltrb[..., 3])
    tb_max = jnp.maximum(best_ltrb[..., 1], best_ltrb[..., 3])
    ctr = jnp.sqrt(jnp.clip((lr_min / jnp.maximum(lr_max, 1e-6))
                            * (tb_min / jnp.maximum(tb_max, 1e-6)), 0, 1))
    return cls_target, best_ltrb, jnp.where(pos, ctr, 0.0), pos


def _iou_loss(pred_ltrb, target_ltrb):
    """IoU loss between predicted/target center-offset boxes (both >= 0)."""
    pl_, pt, pr, pb = [pred_ltrb[..., i] for i in range(4)]
    tl, tt, tr, tb = [target_ltrb[..., i] for i in range(4)]
    p_area = (pl_ + pr) * (pt + pb)
    t_area = (tl + tr) * (tt + tb)
    iw = jnp.minimum(pl_, tl) + jnp.minimum(pr, tr)
    ih = jnp.minimum(pt, tt) + jnp.minimum(pb, tb)
    inter = jnp.clip(iw, 0) * jnp.clip(ih, 0)
    union = p_area + t_area - inter
    iou = inter / jnp.maximum(union, 1e-6)
    return -jnp.log(jnp.clip(iou, 1e-6, 1.0))


def _giou_loss(pred_ltrb, target_ltrb):
    """1 - GIoU for center-offset boxes sharing an anchor point.

    Generalised IoU adds a penalty proportional to the empty fraction of the
    smallest enclosing box, giving useful gradients even when prediction and
    target barely overlap — unlike -log(IoU), which saturates. This is the
    regression loss of the FCOS-improvements recipe."""
    pl_, pt, pr, pb = [pred_ltrb[..., i] for i in range(4)]
    tl, tt, tr, tb = [target_ltrb[..., i] for i in range(4)]
    p_area = (pl_ + pr) * (pt + pb)
    t_area = (tl + tr) * (tt + tb)
    iw = jnp.minimum(pl_, tl) + jnp.minimum(pr, tr)
    ih = jnp.minimum(pt, tt) + jnp.minimum(pb, tb)
    inter = jnp.clip(iw, 0) * jnp.clip(ih, 0)
    union = p_area + t_area - inter
    iou = inter / jnp.maximum(union, 1e-6)
    ew = jnp.maximum(pl_, tl) + jnp.maximum(pr, tr)
    eh = jnp.maximum(pt, tt) + jnp.maximum(pb, tb)
    enclose = jnp.maximum(ew * eh, 1e-6)
    giou = iou - (enclose - union) / enclose
    return 1.0 - giou


def fcos_loss(level_outputs: Sequence[Dict], boxes, labels, n_boxes,
              num_classes: int):
    """Total FCOS loss over pyramid levels for a batch.

    boxes: (B, M, 4); labels: (B, M); n_boxes: (B,).

    Normalisation follows the FCOS-improvements recipe: classification and
    centerness by the positive count; the GIoU regression term is weighted by
    the centerness target and normalised by its sum, so well-centred
    locations dominate the box gradient."""
    total_cls = 0.0
    total_box = 0.0
    total_ctr = 0.0
    total_pos = 0.0
    total_ctr_w = 0.0
    for lvl, rng in zip(level_outputs, level_ranges(len(level_outputs))):
        logits = lvl["logits"]
        offsets = lvl["offsets"]
        ctr_logits = lvl["centerness"][..., 0]
        bsz, h, w, c = logits.shape
        assign = jax.vmap(
            lambda bx, lb, nb: _assign_level(bx, lb, nb, h, w, lvl["stride"],
                                             rng, c))
        cls_t, box_t, ctr_t, pos = assign(boxes, labels, n_boxes)
        total_cls = total_cls + jnp.sum(sigmoid_focal_loss(logits, cls_t))
        posf = pos.astype(jnp.float32)
        total_box = total_box + jnp.sum(
            _giou_loss(offsets, box_t) * ctr_t * posf)
        total_ctr = total_ctr + jnp.sum(
            optax.sigmoid_binary_cross_entropy(ctr_logits, ctr_t) * posf)
        total_pos = total_pos + jnp.sum(posf)
        total_ctr_w = total_ctr_w + jnp.sum(ctr_t * posf)
    n_pos = jnp.maximum(total_pos, 1.0)
    cls = total_cls / n_pos
    box = total_box / jnp.maximum(total_ctr_w, 1e-6)
    ctr = total_ctr / n_pos
    return {
        "cls": cls,
        "box": box,
        "ctr": ctr,
        "total": cls + box + ctr,
        "n_pos": total_pos,
    }


def make_detection_train_step(module: FCOSDetector, tx):
    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch):
        def loss_fn(params):
            outs, mut = module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["hazy"], True, mutable=["batch_stats"])
            losses = fcos_loss(outs, batch["boxes"], batch["labels"],
                               batch["n_boxes"],
                               module.num_classes)
            return losses["total"], (mut["batch_stats"], losses)

        (_, (bs, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(tx, grads, new_batch_stats=bs)
        return new_state, losses

    return step


def train_detection(config, epochs: int = None, resume: bool = False,
                    img_size: int = 512):
    """Fine-tune the detector on the detection dataset; returns
    (DetectionModel, TrainState)."""
    det = create_detection_model(config)
    key = jax.random.PRNGKey(config["seed"] + 7)
    variables = det.init(key, image_size=img_size)
    tx = make_optimizer(config["detection"]["learning_rate"],
                        config["detection"].get("weight_decay", 0.0))
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))

    # Train on the train split's CLEAR frames; evaluation happens on test via
    # evaluate_object_detection (training on the eval split would make the
    # hazy-vs-dehazed mAP comparison overfitting-flattered). Clear frames
    # mirror the reference's COCO-pretrained clean-image detector
    # (reference: models/detection.py:23-51): haze degrades a clean-trained
    # detector, and dehazing should recover mAP — training on hazy frames
    # would instead make haze in-distribution and invert the comparison.
    loader = get_detection_dataloader(config, split="train", img_size=img_size,
                                      image_source="clear", augment=True,
                                      shuffle=True)
    val_loader = get_detection_dataloader(config, split="val",
                                          img_size=img_size,
                                          image_source="clear")
    step = make_detection_train_step(det.module, tx)

    @jax.jit
    def val_step(params, batch_stats, batch):
        outs = det.module.apply({"params": params,
                                 "batch_stats": batch_stats}, batch["hazy"])
        return fcos_loss(outs, batch["boxes"], batch["labels"],
                         batch["n_boxes"], det.module.num_classes)["total"]
    logger = MetricsLogger(os.path.join(config.get("_logs_dir", "logs"),
                                        "detection"))
    ckpt_dir = config["detection"]["checkpoint_dir"]
    epochs = epochs if epochs is not None else 1
    best_val = float("nan")
    base_lr = float(config["detection"]["learning_rate"])
    from adam_dehaze_tpu.training.state import set_learning_rate
    for epoch in range(epochs):
        # One-epoch linear warmup then cosine decay to 5% — from-scratch
        # detector training is warmup-sensitive (focal-loss prior bias aside,
        # early GIoU gradients on random offsets are large).
        if epochs > 1:
            if epoch == 0:
                lr = base_lr * 0.3
            else:
                t = (epoch - 1) / max(epochs - 1, 1)
                lr = base_lr * (0.05 + 0.95 * 0.5 *
                                (1 + float(np.cos(np.pi * t))))
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, lr))
        # Reseed per-item augmentation (reach through a host-shard view).
        ds = getattr(loader.dataset, "base", loader.dataset)
        ds.epoch = epoch
        tots: List[float] = []
        for batch in loader:
            b = device_batch(batch)
            state, losses = step(state, b)
            tots.append(float(losses["total"]))
        avg = float(np.mean(tots)) if tots else float("nan")
        vals = [float(val_step(state.params, state.batch_stats,
                               device_batch(b))) for b in val_loader]
        val_loss = float(np.mean(vals)) if vals else float("nan")
        logger.scalars(epoch, {"train/loss": avg, "val/loss": val_loss})
        print(f"[detection] Epoch {epoch + 1}/{epochs}: loss={avg:.4f} "
              f"val_loss={val_loss:.4f}")
        # Best-by-val-loss selection (the trainers' shared convention,
        # reference train_classifier.py:149-155); epoch checkpoints for
        # resume forensics.
        if not np.isfinite(best_val) or (np.isfinite(val_loss)
                                         and val_loss < best_val):
            best_val = val_loss
            ckpt.save_checkpoint(ckpt_dir, "best_model", state_to_tree(state),
                                 {"epoch": epoch + 1, "loss": avg,
                                  "val_loss": val_loss})
    # Reload the best epoch (the live state was donated by later steps, so
    # restore from the checkpoint rather than holding a stale reference).
    from adam_dehaze_tpu.training.common import tree_to_state
    best = ckpt.best_model_path(ckpt_dir)
    if os.path.isdir(best):
        tree, _ = ckpt.load_checkpoint(best, state_to_tree(state))
        state = tree_to_state(state, tree)
    det.variables = {"params": state.params, "batch_stats": state.batch_stats}
    logger.close()
    return det, state
