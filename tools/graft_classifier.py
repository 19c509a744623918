#!/usr/bin/env python
"""Graft a retrained classifier into an experiment's joint checkpoint.

The joint checkpoint embeds the classifier subtree (params["classifier"],
batch_stats["classifier"]) — serving and evaluation load ONLY the joint
best (evaluation/evaluate.py:_load_joint). After retraining the classifier
alone (e.g. the round-5 boundary-refog retrain), this tool swaps the
retrained subtree into the joint state and saves a new joint best, leaving
the dehazing branches and gate untouched. The classifier slots of the joint
Adam moments are reset to zero (they described the OLD weights; the joint
checkpoint is a serving artifact — anyone resuming joint training warms up
those moments in a few steps).

Usage:
  python tools/graft_classifier.py --experiment experiments/full_system_r5
  # classifier defaults to <experiment>/checkpoints/classifier's best_model;
  # --classifier_dir overrides.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiment", required=True)
    p.add_argument("--classifier_dir", default=None)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")  # host-side tree surgery only
    import jax.numpy as jnp
    import numpy as np

    from adam_dehaze_tpu.config import load_config, update_checkpoint_paths
    from adam_dehaze_tpu.evaluation.evaluate import _load_joint
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.training import checkpoint as ckpt
    from adam_dehaze_tpu.training.common import state_to_tree

    config = update_checkpoint_paths(
        load_config(os.path.join(args.experiment, "config.yaml")),
        args.experiment)
    clf_dir = args.classifier_dir or config["classifier"]["checkpoint_dir"]
    clf_best = ckpt.best_model_path(clf_dir)
    if not os.path.isdir(clf_best):
        raise SystemExit(f"no classifier best_model under {clf_dir}")

    router, state = _load_joint(config)

    # train_classifier saves the FULL TrainState tree (orbax restores
    # strictly against a matching template), so rebuild the same template
    # via the trainer's own init — a one-time CPU init of the small
    # classifier, no TPU compile.
    from adam_dehaze_tpu.training.train_classifier import _init_state
    model = create_classifier(config)
    img = config["dataset"]["img_size"]
    clf_state, _tx = _init_state(model, config, jax.random.PRNGKey(0), img)
    tree, meta = ckpt.load_checkpoint(clf_best, state_to_tree(clf_state))
    print(f"classifier best: {clf_best} "
          f"(val_acc {meta.get('val_acc', 'n/a')})")

    state.params["classifier"] = jax.tree_util.tree_map(
        np.asarray, tree["params"])
    state.batch_stats["classifier"] = jax.tree_util.tree_map(
        np.asarray, tree["batch_stats"])

    # Zero the stale classifier Adam moments (leave counts/steps alone).
    def _zero_clf(x):
        return jax.tree_util.tree_map(np.zeros_like, x)

    def _walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "classifier" and isinstance(v, dict):
                    node[k] = _zero_clf(v)
                else:
                    _walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                _walk(v)
        elif hasattr(node, "_fields"):  # optax NamedTuple states
            for v in node:
                _walk(v)

    _walk(state.opt_state)

    joint_dir = config["joint_training"]["checkpoint_dir"]
    path = ckpt.save_checkpoint(joint_dir, "best_model",
                                state_to_tree(state),
                                {"grafted_classifier": 1.0})
    print(f"grafted classifier into {path}")


if __name__ == "__main__":
    main()
