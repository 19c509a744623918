"""Fog-intensity classifier training.

Counterpart of the reference trainer (reference: training/train_classifier.py):
Adam(lr 1e-4, wd 1e-4), CE loss, ReduceLROnPlateau(0.5, patience 5) on
val loss, best-by-val-accuracy checkpoint + every-5-epoch checkpoints,
TensorBoard scalars. TPU-native differences: one jitted train step (data
augmentation inside), batched on-device validation, real `--resume`.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adam_dehaze_tpu.data.augment import augment_triplet
from adam_dehaze_tpu.data.dataset import get_dataloader
from adam_dehaze_tpu.models.classifier import create_classifier
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


def _load_pretrained(variables, pretrained_path: str):
    """Honor `classifier.pretrained` as a path to a CONVERTED orbax
    checkpoint (tools/convert_reference_checkpoint.py): either a full
    classifier tree (kind=classifier: ResNet_0 + Dense_0/1) or a bare
    backbone (kind=resnet18/34/50), merged under the backbone subtree.
    The reference's `pretrained: true` means torchvision ImageNet weights
    (classifier.py:24) — unavailable here, so a bool is a warned no-op."""
    import orbax.checkpoint as ocp
    raw = ocp.StandardCheckpointer().restore(os.path.abspath(pretrained_path))
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    bb = next(k for k in params if k.startswith("ResNet"))
    if any(k.startswith("Dense") for k in raw.get("params", {})):
        tree, _ = ckpt.load_checkpoint(
            pretrained_path, {"params": variables["params"],
                              "batch_stats": variables["batch_stats"]})
        print(f"Loaded full pretrained classifier from {pretrained_path}")
        return tree["params"], tree["batch_stats"]
    tree, _ = ckpt.load_checkpoint(
        pretrained_path, {"params": variables["params"][bb],
                          "batch_stats": variables["batch_stats"][bb]})
    params[bb] = tree["params"]
    stats[bb] = tree["batch_stats"]
    print(f"Loaded pretrained backbone from {pretrained_path}")
    return params, stats


def _init_state(model, config, key, img_size: int) -> Tuple[TrainState, optax.GradientTransformation]:
    dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, dummy)
    pre = config["classifier"].get("pretrained")
    if isinstance(pre, str) and pre:
        p, s = _load_pretrained(variables, pre)
        variables = {"params": p, "batch_stats": s}
    elif pre is True:
        print("classifier.pretrained=true ignored: torchvision ImageNet "
              "weights are unavailable in this environment; pass a converted "
              "checkpoint path instead (tools/convert_reference_checkpoint.py)")
    tx = make_optimizer(config["classifier"]["learning_rate"],
                        config["classifier"]["weight_decay"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    return state, tx


def make_train_step(model, tx, augmentation: bool = True,
                    jitter: float = 0.1, refog: dict | None = None):
    """jitter: ColorJitter strength (reference parity 0.1, dataset.py:101-116).
    Set classifier.jitter: 0 when brightness/contrast ARE the label signal
    (synthetic fog-intensity corpora): +-10% jitter moves samples across
    class boundaries and caps accuracy well below the 99.8% target.

    refog: optional {prob, boundary_frac, margin} — re-render a random subset
    of hazy inputs from the clear images with boundary-weighted fog
    (data/synthetic.py:refog_batch). Targets the router's residual confident
    errors at the beta class edges (VERDICT r4 item 3); off by default."""
    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, key):
        kaug, kdrop, kfog = jax.random.split(key, 3)
        if refog and refog.get("prob", 0.0) > 0 and "clear" in batch:
            from adam_dehaze_tpu.data.synthetic import refog_batch
            batch = refog_batch(kfog, batch,
                                prob=float(refog.get("prob", 0.5)),
                                boundary_frac=float(
                                    refog.get("boundary_frac", 0.5)),
                                margin=float(refog.get("margin", 0.08)))
        if augmentation:
            batch = augment_triplet(kaug, batch, brightness=jitter,
                                    contrast=jitter)

        def loss_fn(params):
            (logits, _), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["hazy"], True, mutable=["batch_stats"],
                rngs={"dropout": kdrop})
            loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["intensity"]))
            acc = jnp.mean((jnp.argmax(logits, -1) == batch["intensity"])
                           .astype(jnp.float32))
            return loss, (mut["batch_stats"], acc)

        (loss, (bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(tx, grads, new_batch_stats=bs)
        return new_state, {"loss": loss, "acc": acc}

    return step


def make_eval_step(model):
    @jax.jit
    def step(state: TrainState, batch):
        logits, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["hazy"])
        per = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["intensity"])
        correct = (jnp.argmax(logits, -1) == batch["intensity"]).astype(jnp.float32)
        mask = batch.get("mask", jnp.ones_like(per, dtype=bool))
        return {
            "loss": masked_mean(per, mask),
            "acc": masked_mean(correct, mask),
            "n": jnp.sum(mask),
            "pred": jnp.argmax(logits, -1),
        }

    return step


def train_classifier(config, resume: bool = False):
    """Returns (model, final TrainState). (reference: train_classifier.py:13-181)"""
    key = jax.random.PRNGKey(config["seed"])
    model = create_classifier(config)
    img_size = config["dataset"]["img_size"]
    state, tx = _init_state(model, config, key, img_size)

    ckpt_dir = config["classifier"]["checkpoint_dir"]
    logger = MetricsLogger(os.path.join(config.get("_logs_dir", "logs"), "classifier"))
    scheduler = ReduceLROnPlateau(factor=0.5, patience=5)

    start_epoch = 0
    best_val_acc = 0.0
    if resume:
        latest = ckpt.find_latest_checkpoint(ckpt_dir)
        if latest:
            tree, metrics = ckpt.load_checkpoint(latest, state_to_tree(state))
            state = tree_to_state(state, tree)
            start_epoch = int(metrics.get("epoch", 0))
            best_val_acc = metrics.get("best_val_acc", 0.0)
            print(f"Resumed from {latest} at epoch {start_epoch}")

    train_loader = get_dataloader(config, "train")
    val_loader = get_dataloader(config, "val")
    train_step = make_train_step(model, tx,
                                 config["dataset"].get("augmentation", True),
                                 jitter=config["classifier"].get("jitter", 0.1),
                                 refog=config["classifier"].get("refog"))
    eval_step = make_eval_step(model)

    epochs = config["classifier"]["epochs"]
    for epoch in range(start_epoch, epochs):
        key, ek = jax.random.split(key)
        losses, accs = [], []
        for batch in device_prefetch(train_loader):
            ek, sk = jax.random.split(ek)
            state, m = train_step(state, batch, sk)
            losses.append(m["loss"])
            accs.append(m["acc"])
        train_loss = float(np.mean(jax.device_get(losses)))
        train_acc = float(np.mean(jax.device_get(accs)))

        val = evaluate_classifier_pass(eval_step, state, val_loader)
        state = state.replace(
            opt_state=scheduler.step(val["loss"], state.opt_state)[0])

        logger.scalars(epoch, {
            "train/loss": train_loss, "train/acc": train_acc,
            "val/loss": val["loss"], "val/acc": val["acc"],
            "lr": get_learning_rate(state.opt_state),
        })
        print(f"Epoch {epoch + 1}/{epochs}: train_loss={train_loss:.4f} "
              f"train_acc={train_acc:.4f} val_loss={val['loss']:.4f} "
              f"val_acc={val['acc']:.4f}")

        if val["acc"] > best_val_acc:
            best_val_acc = val["acc"]
            ckpt.save_checkpoint(ckpt_dir, "best_model", state_to_tree(state),
                                 {"epoch": epoch + 1, "val_acc": val["acc"],
                                  "val_loss": val["loss"],
                                  "best_val_acc": best_val_acc})
        if (epoch + 1) % 5 == 0:
            ckpt.save_checkpoint(ckpt_dir, f"checkpoint_epoch_{epoch + 1}",
                                 state_to_tree(state),
                                 {"epoch": epoch + 1, "val_acc": val["acc"],
                                  "best_val_acc": best_val_acc})

    best = ckpt.best_model_path(ckpt_dir)
    if os.path.isdir(best):
        tree, _ = ckpt.load_checkpoint(best, state_to_tree(state))
        state = tree_to_state(state, tree)
    logger.close()
    return model, state


def evaluate_classifier_pass(eval_step, state, loader) -> Dict[str, float]:
    tot_loss, tot_acc, tot_n = 0.0, 0.0, 0
    for batch in loader:
        m = eval_step(state, device_batch(batch))
        n = int(m["n"])
        tot_loss += float(m["loss"]) * n
        tot_acc += float(m["acc"]) * n
        tot_n += n
    out = {"loss": tot_loss / max(tot_n, 1), "acc": tot_acc / max(tot_n, 1)}
    # Multi-host: average the per-host-shard metrics so every process makes
    # the same best-checkpoint decision (identity when single-process).
    from adam_dehaze_tpu.parallel.multihost import all_hosts_mean_tree
    return all_hosts_mean_tree(out)


def evaluate_classifier(model, state, config) -> Dict:
    """Test-split evaluation with confusion matrix + report
    (reference: train_classifier.py:183-226). Single pass: metrics and
    per-sample predictions accumulate together."""
    loader = get_dataloader(config, "test")
    eval_step = make_eval_step(model)
    preds, labels = [], []
    tot_loss, tot_acc, tot_n = 0.0, 0.0, 0
    for batch in loader:
        m = eval_step(state, device_batch(batch))
        n = int(m["n"])
        tot_loss += float(m["loss"]) * n
        tot_acc += float(m["acc"]) * n
        tot_n += n
        mask = batch["mask"]
        preds.append(np.asarray(m["pred"])[mask])
        labels.append(batch["intensity"][mask])
    preds = np.concatenate(preds) if preds else np.zeros(0, np.int64)
    labels = np.concatenate(labels) if labels else np.zeros(0, np.int64)
    result = {"accuracy": tot_acc / max(tot_n, 1),
              "loss": tot_loss / max(tot_n, 1)}
    try:
        from sklearn.metrics import classification_report, confusion_matrix
        result["confusion_matrix"] = confusion_matrix(
            labels, preds, labels=[0, 1, 2]).tolist()
        result["report"] = classification_report(
            labels, preds, labels=[0, 1, 2],
            target_names=["low", "medium", "high"], output_dict=True,
            zero_division=0)
    except Exception:
        pass
    print(f"Test accuracy: {result['accuracy']:.4f}")
    return result
