"""Dehazing and joint training losses.

TPU-native counterpart of the reference loss stack (reference:
training/loss.py). All losses are pure functions of (frozen feature-net
params, predictions, targets) so they jit and differentiate cleanly; the VGG
feature extractor runs ONCE per call collecting every tap (the reference
rebuilt a sub-network per layer per step, loss.py:70-84).

`DehazingLoss` = λ_l1·L1 + λ_content·VGG-MSE + λ_perceptual·LPIPS
(reference: loss.py:110-162). The optional density-weighted variant (the
paper's "density loss", exposed per BASELINE north star) weights the
per-pixel L1 term by the estimated local fog density.

`JointLoss` = λ_dh·DehazingLoss + λ_cls·CE + λ_det·(passthrough)
(reference: loss.py:164-224).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from adam_dehaze_tpu.data.synthetic import fog_density_map
from adam_dehaze_tpu.losses.lpips import LPIPS, lpips_from_unit_range
from adam_dehaze_tpu.nn.vgg import VGG16Features

CONTENT_TAPS = ("relu2_2", "relu3_3", "relu4_3")


class DehazingLoss:
    """Combined reconstruction loss. Frozen feature-net params are created by
    `init` and passed to `__call__` (they are constants w.r.t. optimisation)."""

    def __init__(self, lambda_l1: float = 1.0, lambda_content: float = 0.1,
                 lambda_perceptual: float = 0.1, density_weighted: bool = False,
                 lambda_density: float = 0.1, dtype=jnp.float32,
                 vgg_weights: Optional[str] = None,
                 lpips_weights: Optional[str] = None):
        self.lambda_l1 = lambda_l1
        self.lambda_content = lambda_content
        self.lambda_perceptual = lambda_perceptual
        self.density_weighted = density_weighted
        self.lambda_density = lambda_density
        self.content_net = VGG16Features(taps=CONTENT_TAPS, dtype=dtype)
        self.lpips_net = LPIPS(dtype=dtype)
        self.vgg_weights = vgg_weights
        self.lpips_weights = lpips_weights

    def init(self, key, image_shape=(1, 64, 64, 3)) -> Dict[str, Any]:
        """Feature-net params: random templates, overridden by converted
        checkpoints when `loss.vgg_weights` / `loss.lpips_weights` point at
        orbax artifacts from tools/convert_reference_checkpoint.py (the
        reference trains against PRETRAINED VGG16/LPIPS nets, loss.py:19-38,
        91; without converted weights these remain random surrogates)."""
        kc, kl = jax.random.split(key)
        dummy = jnp.zeros(image_shape, jnp.float32)
        out = {
            "content": self.content_net.init(kc, dummy),
            "lpips": self.lpips_net.init(kl, dummy, dummy),
        }
        if self.vgg_weights or self.lpips_weights:
            from adam_dehaze_tpu.training.checkpoint import load_checkpoint
            if self.vgg_weights:
                out["content"], _ = load_checkpoint(self.vgg_weights,
                                                    dict(out["content"]))
            if self.lpips_weights:
                out["lpips"], _ = load_checkpoint(self.lpips_weights,
                                                  dict(out["lpips"]))
        return out

    def content(self, loss_params, pred, target) -> jax.Array:
        # One feature pass over the concatenated pair: same numerics (the
        # VGG trunk is batch-independent), half the kernel launches and
        # better MXU batching than separate pred/target passes.
        n = pred.shape[0]
        f = self.content_net.apply(loss_params["content"],
                                   jnp.concatenate([pred, target], axis=0))
        losses = [jnp.mean((f[t][:n] - f[t][n:]) ** 2) for t in CONTENT_TAPS]
        return sum(losses) / len(losses)

    def __call__(self, loss_params, pred, target,
                 hazy: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        err = jnp.abs(pred - target)
        if self.density_weighted and hazy is not None:
            density = jax.lax.stop_gradient(fog_density_map(hazy))
            w = 1.0 + self.lambda_density * density[..., None]
            l1 = jnp.sum(w * err) / jnp.sum(w * jnp.ones_like(err))
        else:
            l1 = jnp.mean(err)
        content = self.content(loss_params, pred, target)
        perceptual = jnp.mean(
            lpips_from_unit_range(self.lpips_net, loss_params["lpips"], pred, target))
        total = (self.lambda_l1 * l1 + self.lambda_content * content
                 + self.lambda_perceptual * perceptual)
        return total, {"l1": l1, "content": content, "perceptual": perceptual,
                       "total": total}


class JointLoss:
    """Dehazing + classification (+ detection passthrough) loss
    (reference: loss.py:164-224)."""

    def __init__(self, lambda_dehazing: float = 1.0,
                 lambda_classification: float = 0.2,
                 lambda_detection: float = 0.5,
                 dehazing_loss: Optional[DehazingLoss] = None):
        self.lambda_dehazing = lambda_dehazing
        self.lambda_classification = lambda_classification
        self.lambda_detection = lambda_detection
        self.dehazing_loss = dehazing_loss or DehazingLoss()

    def init(self, key, image_shape=(1, 64, 64, 3)):
        return self.dehazing_loss.init(key, image_shape)

    def __call__(self, loss_params, pred, target_clear,
                 pred_intensity=None, target_intensity=None,
                 detection_loss=None, hazy=None):
        dh, dh_components = self.dehazing_loss(loss_params, pred, target_clear,
                                               hazy=hazy)
        if pred_intensity is not None and target_intensity is not None:
            cls = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                pred_intensity, target_intensity))
        else:
            cls = jnp.zeros((), jnp.float32)
        det = detection_loss if detection_loss is not None else jnp.zeros((), jnp.float32)
        total = (self.lambda_dehazing * dh
                 + self.lambda_classification * cls
                 + self.lambda_detection * det)
        return total, {"dehazing": dh, "classification": cls, "detection": det,
                       "total": total, "dehazing_components": dh_components}


def get_dehazing_loss(config) -> DehazingLoss:
    """(reference: loss.py:226-232, loss weights fixed there; configurable
    here via the `loss` section)."""
    loss_cfg = config.get("loss", {})
    dtype = jnp.dtype(config.get("tpu", {}).get("compute_dtype", "float32"))
    return DehazingLoss(
        lambda_l1=loss_cfg.get("lambda_l1", 1.0),
        lambda_content=loss_cfg.get("lambda_content", 0.1),
        lambda_perceptual=loss_cfg.get("lambda_perceptual", 0.1),
        density_weighted=loss_cfg.get("density_weighted", False),
        lambda_density=loss_cfg.get("lambda_density", 0.1),
        dtype=dtype,
        vgg_weights=loss_cfg.get("vgg_weights") or None,
        lpips_weights=loss_cfg.get("lpips_weights") or None,
    )


def get_joint_loss(config) -> JointLoss:
    """(reference: loss.py:234-241)"""
    jt = config["joint_training"]
    return JointLoss(
        lambda_dehazing=jt["lambda_dehazing"],
        lambda_classification=jt["lambda_classification"],
        lambda_detection=jt["lambda_detection"],
        dehazing_loss=get_dehazing_loss(config),
    )
