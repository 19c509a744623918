"""Train state, optimiser construction, and plateau LR scheduling.

The reference uses torch Adam (+L2-in-grad weight decay) with
ReduceLROnPlateau(min, factor 0.5, patience 5) on the validation loss
(reference: train_classifier.py:24-33, train_dehazing.py:33-41,
train_joint.py:85-93). Here the optimiser is optax with the learning rate
injected as a runtime hyperparameter so the host-side plateau scheduler can
lower it without rebuilding (and without resetting Adam moments).
"""
from __future__ import annotations

from typing import Any, Optional

import flax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    def apply_gradients(self, tx: optax.GradientTransformation, grads,
                        new_batch_stats=None):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(learning_rate: float, weight_decay: float = 0.0
                   ) -> optax.GradientTransformation:
    """torch-Adam-compatible: decay added to the gradient BEFORE the Adam
    moments (optax.adamw would decay after — different trajectory)."""
    def build(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.adam(learning_rate))
        return optax.chain(*steps)
    return optax.inject_hyperparams(build)(learning_rate=learning_rate)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Functionally update the injected learning rate."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    replace = getattr(opt_state, "replace", None) or opt_state._replace
    return replace(hyperparams=hp)


class ReduceLROnPlateau:
    """Host-side plateau scheduler, torch semantics (mode=min, factor,
    patience; no cooldown/threshold subtleties beyond rel-eps 1e-4)."""

    def __init__(self, factor: float = 0.5, patience: int = 5,
                 min_lr: float = 0.0, mode: str = "min"):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.mode = mode
        self.best: Optional[float] = None
        self.num_bad = 0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1 - 1e-4)
        return metric > self.best * (1 + 1e-4)

    def step(self, metric: float, opt_state):
        """Returns (opt_state, reduced: bool)."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
            return opt_state, False
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            new_lr = max(get_learning_rate(opt_state) * self.factor, self.min_lr)
            return set_learning_rate(opt_state, new_lr), True
        return opt_state, False
