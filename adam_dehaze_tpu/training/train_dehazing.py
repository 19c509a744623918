"""Per-branch dehazing training.

Counterpart of the reference trainer (reference: training/train_dehazing.py):
per-branch Adam, DehazingLoss, plateau scheduler on val loss, best-by-PSNR
checkpoints, TB images every 5 epochs, low -> medium -> high sequence.

TPU-native differences:
- Each branch trains on a PER-INTENSITY DATA STREAM (the sample list is
  filtered up front) instead of masking mixed batches and wasting compute
  (reference: train_dehazing.py:73 filters inside the step).
- Validation PSNR/SSIM are batched on device (ops/image.py) instead of
  per-image host skimage calls (reference: train_dehazing.py:146-159).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.data.augment import augment_triplet
from adam_dehaze_tpu.data.dataset import (
    DataLoader,
    HazyImageDataset,
    INTENSITY_MAP,
)
from adam_dehaze_tpu.losses.dehazing import get_dehazing_loss
from adam_dehaze_tpu.models.branches import (
    create_high_intensity_model,
    create_low_intensity_model,
    create_medium_intensity_model,
)
from adam_dehaze_tpu.ops.image import psnr, ssim_gray
from adam_dehaze_tpu.training import checkpoint as ckpt
from adam_dehaze_tpu.training.common import (
    device_batch,
    device_prefetch,
    masked_mean,
    state_to_tree,
    tree_to_state,
)
from adam_dehaze_tpu.training.logging import MetricsLogger
from adam_dehaze_tpu.training.state import (
    ReduceLROnPlateau,
    TrainState,
    get_learning_rate,
    make_optimizer,
)

_FACTORIES = {
    "low": create_low_intensity_model,
    "medium": create_medium_intensity_model,
    "high": create_high_intensity_model,
}


class FilteredDataset:
    """View of HazyImageDataset restricted to one intensity class — the
    per-intensity stream that replaces in-batch mask filtering."""

    def __init__(self, base: HazyImageDataset, intensity: str):
        self.base = base
        label = INTENSITY_MAP[intensity]
        self.indices = [i for i, s in enumerate(base.samples)
                        if s["intensity"] == label]

    def __len__(self):
        return len(self.indices)

    def load(self, idx: int):
        return self.base.load(self.indices[idx])


def get_intensity_loader(config, split: str, intensity: str) -> DataLoader:
    key = {"train": "train_path", "val": "val_path"}.get(split, "test_path")
    base = HazyImageDataset(config["dataset"][key], split,
                            config["dataset"]["img_size"])
    ds = FilteredDataset(base, intensity)
    if len(ds) == 0:
        raise ValueError(
            f"No '{intensity}' samples for split '{split}' under "
            f"{os.path.join(config['dataset'][key], split)} — an empty "
            "stream would train to NaN (see get_dataloader for the layout)")
    return DataLoader(ds, batch_size=config["dataset"]["batch_size"],
                      shuffle=(split == "train"),
                      num_workers=config["dataset"]["num_workers"],
                      seed=config["seed"])


def make_train_step(model, tx, loss, loss_params, augmentation=True,
                    remat=False, img_size=None):
    def fwd(params, batch_stats, x):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           x, True, mutable=["batch_stats"])
    # Recompute activations in the backward pass (HBM for FLOPs); 'fullres'
    # selectively recomputes only full-resolution ones (training/remat.py).
    from adam_dehaze_tpu.training.remat import apply_remat
    fwd = apply_remat(fwd, remat, img_size)

    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, key):
        if augmentation:
            batch = augment_triplet(key, batch)

        def loss_fn(params):
            out, mut = fwd(params, state.batch_stats, batch["hazy"])
            total, comps = loss(loss_params, out, batch["clear"],
                                hazy=batch["hazy"])
            return total, (mut["batch_stats"], comps)

        (_, (bs, comps)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(tx, grads, new_batch_stats=bs)
        return new_state, comps

    return step


def make_eval_step(model, loss, loss_params):
    @jax.jit
    def step(state: TrainState, batch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["hazy"])
        total, _ = loss(loss_params, out, batch["clear"], hazy=batch["hazy"])
        mask = batch.get("mask", jnp.ones(out.shape[0], bool))
        return {
            "loss": total,
            "psnr": masked_mean(psnr(out, batch["clear"]), mask),
            "ssim": masked_mean(ssim_gray(out, batch["clear"]), mask),
            "n": jnp.sum(mask),
            "dehazed": out,
        }

    return step


def train_dehazing_model(intensity: str, config, resume: bool = False,
                         loss_params=None):
    """Train one branch; returns (model, state).
    (reference: train_dehazing.py:16-226; 30 epochs were hardcoded there at
    :63 — here configurable via dehazing.epochs, default 30)."""
    key = jax.random.PRNGKey(config["seed"] + INTENSITY_MAP[intensity])
    model = _FACTORIES[intensity](config)
    img = config["dataset"]["img_size"]
    dummy = jnp.zeros((1, img, img, 3), jnp.float32)
    variables = model.init(key, dummy)
    tx = make_optimizer(config["dehazing"][intensity]["learning_rate"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))

    loss = get_dehazing_loss(config)
    if loss_params is None:
        loss_params = loss.init(jax.random.PRNGKey(0), (1, img, img, 3))

    ckpt_dir = os.path.join(config["dehazing"]["checkpoint_dir"], intensity)
    logger = MetricsLogger(os.path.join(config.get("_logs_dir", "logs"),
                                        "dehazing", intensity))
    scheduler = ReduceLROnPlateau(factor=0.5, patience=5)

    start_epoch, best_val_psnr = 0, 0.0
    if resume:
        latest = ckpt.find_latest_checkpoint(ckpt_dir)
        if latest:
            tree, metrics = ckpt.load_checkpoint(latest, state_to_tree(state))
            state = tree_to_state(state, tree)
            start_epoch = int(metrics.get("epoch", 0))
            best_val_psnr = metrics.get("best_val_psnr", 0.0)
            print(f"Resumed {intensity} from {latest} at epoch {start_epoch}")

    train_loader = get_intensity_loader(config, "train", intensity)
    val_loader = get_intensity_loader(config, "val", intensity)
    train_step = make_train_step(model, tx, loss, loss_params,
                                 config["dataset"].get("augmentation", True),
                                 remat=config.get("tpu", {}).get("remat", False),
                                 img_size=config["dataset"]["img_size"])
    eval_step = make_eval_step(model, loss, loss_params)

    epochs = config["dehazing"].get("epochs", 30)
    for epoch in range(start_epoch, epochs):
        key, ek = jax.random.split(key)
        train_losses = []
        for batch in device_prefetch(train_loader):
            ek, sk = jax.random.split(ek)
            state, comps = train_step(state, batch, sk)
            train_losses.append(comps["total"])
        train_loss = float(np.mean(jax.device_get(train_losses))) \
            if train_losses else float("nan")

        val = _validate(eval_step, state, val_loader)
        state = state.replace(
            opt_state=scheduler.step(val["loss"], state.opt_state)[0])
        logger.scalars(epoch, {
            "train/loss": train_loss, "val/loss": val["loss"],
            "val/psnr": val["psnr"], "val/ssim": val["ssim"],
            "lr": get_learning_rate(state.opt_state)})
        if epoch % 5 == 0 and val.get("images") is not None:
            logger.images(epoch, f"{intensity}/dehazed", val["images"])
        print(f"[{intensity}] Epoch {epoch + 1}/{epochs}: "
              f"loss={train_loss:.4f} val_psnr={val['psnr']:.2f} "
              f"val_ssim={val['ssim']:.4f}")

        if val["psnr"] > best_val_psnr:
            best_val_psnr = val["psnr"]
            ckpt.save_checkpoint(ckpt_dir, "best_model", state_to_tree(state),
                                 {"epoch": epoch + 1, "val_psnr": val["psnr"],
                                  "val_ssim": val["ssim"],
                                  "best_val_psnr": best_val_psnr})
        if (epoch + 1) % 5 == 0:
            ckpt.save_checkpoint(ckpt_dir, f"checkpoint_epoch_{epoch + 1}",
                                 state_to_tree(state),
                                 {"epoch": epoch + 1,
                                  "best_val_psnr": best_val_psnr})

    best = ckpt.best_model_path(ckpt_dir)
    if os.path.isdir(best):
        tree, _ = ckpt.load_checkpoint(best, state_to_tree(state))
        state = tree_to_state(state, tree)
    logger.close()
    return model, state


def _validate(eval_step, state, loader) -> Dict[str, float]:
    tot = {"loss": 0.0, "psnr": 0.0, "ssim": 0.0}
    n_total, images = 0, None
    for batch in loader:
        m = eval_step(state, device_batch(batch))
        n = int(m["n"])
        for k in tot:
            tot[k] += float(m[k]) * n
        n_total += n
        if images is None:
            images = np.asarray(m["dehazed"][:4])
    out = {k: v / max(n_total, 1) for k, v in tot.items()}
    # Multi-host: each host validated its own shard; average across hosts so
    # every process agrees on best-checkpoint decisions (identity when
    # single-process).
    from adam_dehaze_tpu.parallel.multihost import all_hosts_mean_tree
    out = all_hosts_mean_tree(out)
    out["images"] = images
    return out


def train_all_dehazing_models(config, resume: bool = False):
    """low -> medium -> high, sharing frozen loss-net params
    (reference: train_dehazing.py:228-246)."""
    img = config["dataset"]["img_size"]
    loss = get_dehazing_loss(config)
    loss_params = loss.init(jax.random.PRNGKey(0), (1, img, img, 3))
    out = {}
    for intensity in ("low", "medium", "high"):
        print(f"\n=== Training {intensity} intensity model ===")
        out[intensity] = train_dehazing_model(intensity, config, resume,
                                              loss_params)
    return out


def evaluate_dehazing_model(model, state, intensity: str, config) -> Dict[str, float]:
    """Test-split metrics for one branch (reference: train_dehazing.py:248-316)."""
    loss = get_dehazing_loss(config)
    img = config["dataset"]["img_size"]
    loss_params = loss.init(jax.random.PRNGKey(0), (1, img, img, 3))
    loader = get_intensity_loader(config, "test", intensity)
    eval_step = make_eval_step(model, loss, loss_params)
    val = _validate(eval_step, state, loader)
    print(f"[{intensity}] test: psnr={val['psnr']:.2f} ssim={val['ssim']:.4f}")
    return {k: v for k, v in val.items() if k != "images"}
