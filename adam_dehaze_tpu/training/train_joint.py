"""Joint (classifier -> router -> branches) training.

Counterpart of the reference joint trainer (reference:
training/train_joint.py:29-318): loads the 4 pretrained best checkpoints,
builds the router, and optimises router + branch parameters with
JointLoss(dehazed, clear, logits, labels) at lr 5e-5 for
joint_training.epochs epochs; plateau scheduler on val loss; best-by-PSNR
checkpoint holding every sub-state.

Faithful quirk preserved: classifier PARAMETERS are excluded from the
optimiser, but the classifier runs in train mode (its BN statistics update
and gradients flow through its logits into the routing weights) — exactly the
reference's arrangement (train_joint.py:81-89,118-121). Here the exclusion is
a gradient mask over the `classifier` subtree.

Divergence (documented): with `routing.type: hard`, the reference passes raw
logits where the HardRouter expects integer labels (train_joint.py:142 vs
routing.py:23) — a latent bug. We route hard with argmax(logits).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.data.augment import augment_triplet
from adam_dehaze_tpu.data.dataset import get_dataloader
from adam_dehaze_tpu.losses.dehazing import get_joint_loss
from adam_dehaze_tpu.models.branches import create_branch_models
from adam_dehaze_tpu.models.classifier import create_classifier
from adam_dehaze_tpu.models.routing import create_router
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


def build_router_state(config, key) -> Tuple[Any, TrainState, Any]:
    """Create router module + TrainState, loading pretrained sub-checkpoints
    when available (reference: train_joint.py:18-79)."""
    classifier = create_classifier(config)
    branches = create_branch_models(config)
    router = create_router(branches, classifier, config)

    img = config["dataset"]["img_size"]
    dummy = jnp.zeros((1, img, img, 3), jnp.float32)
    variables = router.init({"params": key, "dropout": key}, dummy)
    params = flax_to_mutable(variables["params"])
    batch_stats = flax_to_mutable(variables["batch_stats"])

    # Graft pretrained subtrees (classifier + 3 branches) if checkpoints exist.
    def graft(sub_key: str, ckpt_dir: str):
        best = ckpt.best_model_path(ckpt_dir)
        if not os.path.isdir(best):
            print(f"Warning: no pretrained checkpoint at {best}")
            return
        template = {"params": params[sub_key], "batch_stats": batch_stats[sub_key]}
        tree, _ = ckpt.load_checkpoint(best)
        # Stage checkpoints store the full TrainState tree; pick the subtrees.
        sub = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
        import flax
        restored = flax.serialization.from_state_dict(template, sub)
        params[sub_key] = restored["params"]
        batch_stats[sub_key] = restored["batch_stats"]
        print(f"Loaded pretrained {sub_key} from {best}")

    graft("classifier", config["classifier"]["checkpoint_dir"])
    for level in ("low", "medium", "high"):
        graft(f"models_{level}",
              os.path.join(config["dehazing"]["checkpoint_dir"], level))

    tx = make_optimizer(config["joint_training"]["learning_rate"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params))
    return router, state, tx


def flax_to_mutable(tree):
    """Deep-copy a (possibly frozen) param tree into plain nested dicts."""
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: flax_to_mutable(v) for k, v in tree.items()}
    return tree


def _mask_classifier_grads(grads):
    """Zero the classifier subtree: params stay frozen while gradients still
    flow through its logits into router/branch params."""
    if "classifier" in grads:
        grads = dict(grads)
        grads["classifier"] = jax.tree_util.tree_map(
            jnp.zeros_like, grads["classifier"])
    return grads


def make_train_step(router, tx, joint_loss, loss_params, augmentation=True,
                    remat=False, img_size=None):
    """remat: False | True/'full' (jax.checkpoint the whole forward) |
    'fullres' (SELECTIVE — structural: the router's branch models must have
    been built from a config with tpu.remat=fullres so their full-resolution
    blocks are nn.remat twins; step-level this mode is identity. See
    training/remat.py)."""
    def fwd(params, batch_stats, x, kdrop):
        return router.apply({"params": params, "batch_stats": batch_stats},
                            x, train=True, rngs={"dropout": kdrop},
                            mutable=["batch_stats"])
    from adam_dehaze_tpu.training.remat import apply_remat
    fwd = apply_remat(fwd, remat, img_size)

    # Donating the state lets XLA update params/Adam moments in place
    # instead of double-buffering them in HBM. Callers must rebind `state`
    # from the return value and never step the same underlying buffers
    # twice (donation deletes the input arrays on every backend).
    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, key):
        kaug, kdrop = jax.random.split(key)
        if augmentation:
            batch = augment_triplet(kaug, batch)

        def loss_fn(params):
            (dehazed, info), mut = fwd(params, state.batch_stats,
                                       batch["hazy"], kdrop)
            logits = info.get("logits")
            total, comps = joint_loss(
                loss_params, dehazed, batch["clear"], logits,
                batch["intensity"] if logits is not None else None,
                hazy=batch["hazy"])
            return total, (mut["batch_stats"], comps, dehazed)

        (_, (bs, comps, dehazed)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = _mask_classifier_grads(grads)
        new_state = state.apply_gradients(tx, grads, new_batch_stats=bs)
        batch_psnr = jnp.mean(psnr(dehazed, batch["clear"]))
        return new_state, {**{k: v for k, v in comps.items()
                              if k != "dehazing_components"},
                           "psnr": batch_psnr}

    return step


def make_hard_branch_step(module, tx, joint_loss, loss_params,
                          augmentation=True):
    """Single-branch train step for the HARD fine-tuning phase.

    The soft joint step pays 3 full branch forward+backward passes per image
    (reference routing.py:114-118 semantics); serving is hard-binned anyway,
    so the tail of joint training can fine-tune each branch on ITS OWN
    intensity stream — oracle binning by the data labels, which is what the
    ~99%-accurate frozen classifier would produce (VERDICT r3 item 5). The
    routing decision is non-differentiable here, so the classifier
    contributes nothing trainable and is skipped entirely (its params are
    frozen by _mask_classifier_grads in the soft phase too); the loss is the
    dehazing part of JointLoss (logits=None -> no CE term)."""
    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, key):
        kaug, kdrop = jax.random.split(key)
        if augmentation:
            batch = augment_triplet(kaug, batch)

        def loss_fn(params):
            dehazed, mut = module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["hazy"], True, mutable=["batch_stats"],
                rngs={"dropout": kdrop})
            total, comps = joint_loss(loss_params, dehazed, batch["clear"],
                                      None, None, hazy=batch["hazy"])
            return total, (mut["batch_stats"], comps, dehazed)

        (_, (bs, comps, dehazed)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(tx, grads, new_batch_stats=bs)
        batch_psnr = jnp.mean(psnr(dehazed, batch["clear"]))
        return new_state, {**{k: v for k, v in comps.items()
                              if k != "dehazing_components"},
                           "psnr": batch_psnr}

    return step


def make_eval_step(router, joint_loss, loss_params):
    @jax.jit
    def step(state: TrainState, batch):
        dehazed, info = router.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["hazy"], train=False)
        logits = info.get("logits")
        total, _ = joint_loss(loss_params, dehazed, batch["clear"], logits,
                              batch["intensity"] if logits is not None else None,
                              hazy=batch["hazy"])
        mask = batch.get("mask", jnp.ones(dehazed.shape[0], bool))
        out = {
            "loss": total,
            "psnr": masked_mean(psnr(dehazed, batch["clear"]), mask),
            "ssim": masked_mean(ssim_gray(dehazed, batch["clear"]), mask),
            "n": jnp.sum(mask),
        }
        if logits is not None:
            correct = (jnp.argmax(logits, -1) == batch["intensity"]).astype(jnp.float32)
            out["cls_acc"] = masked_mean(correct, mask)
        return out

    return step


def train_joint_model(config, resume: bool = False):
    """Returns (router, state). (reference: train_joint.py:29-318)"""
    key = jax.random.PRNGKey(config["seed"] + 100)
    router, state, tx = build_router_state(config, key)

    img = config["dataset"]["img_size"]
    joint_loss = get_joint_loss(config)
    loss_params = joint_loss.init(jax.random.PRNGKey(0), (1, img, img, 3))

    ckpt_dir = config["joint_training"]["checkpoint_dir"]
    logger = MetricsLogger(os.path.join(config.get("_logs_dir", "logs"), "joint"))
    scheduler = ReduceLROnPlateau(factor=0.5, patience=5)

    start_epoch, best_val_psnr = 0, 0.0
    if resume:
        latest = ckpt.find_latest_checkpoint(ckpt_dir)
        if latest:
            tree, metrics = ckpt.load_checkpoint(latest, state_to_tree(state))
            state = tree_to_state(state, tree)
            start_epoch = int(metrics.get("epoch", 0))
            best_val_psnr = metrics.get("best_val_psnr", 0.0)
            print(f"Resumed joint from {latest} at epoch {start_epoch}")

    train_loader = get_dataloader(config, "train")
    val_loader = get_dataloader(config, "val")
    train_step = make_train_step(router, tx, joint_loss, loss_params,
                                 config["dataset"].get("augmentation", True),
                                 remat=config.get("tpu", {}).get("remat", False),
                                 img_size=img)
    eval_step = make_eval_step(router, joint_loss, loss_params)

    epochs = config["joint_training"]["epochs"]
    # Hard fine-tuning tail (VERDICT r3 item 5): the last
    # `hard_finetune_frac` of the epochs drop the 3x soft blend and
    # fine-tune each branch on its own intensity stream (per-branch Adam at
    # the current joint LR — moments reset at the phase switch, a standard
    # fine-tune boundary). 0.0 (default) = reference-faithful soft-only.
    hard_frac = float(config["joint_training"].get("hard_finetune_frac", 0.0))
    hard_start = epochs - int(round(hard_frac * epochs)) if hard_frac else epochs
    hard = None  # built lazily at the phase switch

    def _enter_hard_phase(state):
        import time as _time
        from adam_dehaze_tpu.training.train_dehazing import (
            get_intensity_loader,
        )
        lr = get_learning_rate(state.opt_state)
        phase = {}
        for level in ("low", "medium", "high"):
            btx = make_optimizer(lr)
            bstate = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=state.params[f"models_{level}"],
                batch_stats=state.batch_stats[f"models_{level}"],
                opt_state=btx.init(state.params[f"models_{level}"]))
            phase[level] = {
                "state": bstate,
                "step": make_hard_branch_step(
                    router.models[level], btx, joint_loss, loss_params,
                    config["dataset"].get("augmentation", True)),
                "loader": get_intensity_loader(config, "train", level),
            }
        phase["_time"] = _time
        return phase

    def _merge_hard(state, phase):
        params = dict(state.params)
        stats = dict(state.batch_stats)
        for level in ("low", "medium", "high"):
            params[f"models_{level}"] = phase[level]["state"].params
            stats[f"models_{level}"] = phase[level]["state"].batch_stats
        return state.replace(params=params, batch_stats=stats)

    for epoch in range(start_epoch, epochs):
        key, ek = jax.random.split(key)
        tots = []
        if epoch >= hard_start:
            if hard is None:
                hard = _enter_hard_phase(state)
                print(f"[joint] epoch {epoch + 1}: entering HARD fine-tune "
                      f"phase (per-intensity streams, 1x branch FLOPs)")
            t0 = hard["_time"].perf_counter()
            n_imgs = 0
            for level in ("low", "medium", "high"):
                ph = hard[level]
                for batch in device_prefetch(ph["loader"]):
                    ek, sk = jax.random.split(ek)
                    ph["state"], m = ph["step"](ph["state"],
                                                batch, sk)
                    tots.append(m["total"])
                    n_imgs += batch["hazy"].shape[0]
            jax.block_until_ready(hard["high"]["state"].params)
            dt = hard["_time"].perf_counter() - t0
            state = _merge_hard(state, hard)
            print(f"[joint]   hard-phase epoch throughput: "
                  f"{n_imgs / max(dt, 1e-9):.1f} imgs/s")
        else:
            for batch in device_prefetch(train_loader):
                ek, sk = jax.random.split(ek)
                state, m = train_step(state, batch, sk)
                tots.append(m["total"])
        train_loss = float(np.mean(jax.device_get(tots))) if tots else float("nan")

        val = _validate(eval_step, state, val_loader)
        state = state.replace(
            opt_state=scheduler.step(val["loss"], state.opt_state)[0])
        logger.scalars(epoch, {
            "train/loss": train_loss, "val/loss": val["loss"],
            "val/psnr": val["psnr"], "val/ssim": val["ssim"],
            "val/cls_acc": val.get("cls_acc", 0.0),
            "lr": get_learning_rate(state.opt_state)})
        print(f"[joint] Epoch {epoch + 1}/{epochs}: loss={train_loss:.4f} "
              f"val_psnr={val['psnr']:.2f} val_ssim={val['ssim']:.4f}")

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
    return router, state


def _validate(eval_step, state, loader) -> Dict[str, float]:
    tot: Dict[str, float] = {}
    n_total = 0
    for batch in loader:
        m = eval_step(state, device_batch(batch))
        n = int(m.pop("n"))
        for k, v in m.items():
            tot[k] = tot.get(k, 0.0) + float(v) * n
        n_total += n
    return {k: v / max(n_total, 1) for k, v in tot.items()}


def evaluate_joint_model(router, state, config) -> Dict[str, float]:
    """Test-split joint metrics (reference: train_joint.py:320-415)."""
    img = config["dataset"]["img_size"]
    joint_loss = get_joint_loss(config)
    loss_params = joint_loss.init(jax.random.PRNGKey(0), (1, img, img, 3))
    loader = get_dataloader(config, "test")
    eval_step = make_eval_step(router, joint_loss, loss_params)
    out = _validate(eval_step, state, loader)
    print(f"[joint] test: psnr={out['psnr']:.2f} ssim={out['ssim']:.4f} "
          f"cls_acc={out.get('cls_acc', float('nan')):.4f}")
    return out
