"""Configuration system.

One YAML dict threaded through every entry point, mirroring the reference's
schema and experiment-directory convention (reference: config/config.yaml,
utils/helpers.py:21-53, main.py:21-27). Adds deep-merge over defaults and a
`tpu` section for TPU-native knobs.
"""
from __future__ import annotations

import copy
import os
import time
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

_DEFAULT_PATH = Path(__file__).parent / "configs" / "default.yaml"


def _deep_merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def default_config() -> Dict[str, Any]:
    with open(_DEFAULT_PATH) as f:
        return yaml.safe_load(f)


def load_config(path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Load config: defaults <- YAML file <- explicit overrides."""
    cfg = default_config()
    if path:
        with open(path) as f:
            user = yaml.safe_load(f) or {}
        cfg = _deep_merge(cfg, user)
    if overrides:
        cfg = _deep_merge(cfg, overrides)
    return cfg


def apply_cli_overrides(config: Dict[str, Any], args) -> Dict[str, Any]:
    """Apply argparse overrides, same surface as the reference
    (reference: main.py:67-77)."""
    if getattr(args, "data_dir", None):
        for split in ("train_path", "val_path", "test_path"):
            config["dataset"][split] = args.data_dir
    if getattr(args, "device", None):
        config["device"] = args.device
    if getattr(args, "seed", None) is not None:
        config["seed"] = args.seed
    if getattr(args, "batch_size", None):
        config["dataset"]["batch_size"] = args.batch_size
    return config


def create_experiment_dir(config: Dict[str, Any], exp_name: Optional[str] = None,
                          root: str = "experiments"):
    """Create a timestamped experiment dir and rewrite all checkpoint/result
    paths into it, then snapshot the config (reference: utils/helpers.py:21-53).

    Returns (exp_dir, updated_config).
    """
    if exp_name is None:
        exp_name = f"experiment_{time.strftime('%Y%m%d_%H%M%S')}"

    exp_dir = os.path.join(root, exp_name)
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    logs_dir = os.path.join(exp_dir, "logs")
    results_dir = os.path.join(exp_dir, "results")
    for d in (exp_dir, ckpt_dir, logs_dir, results_dir):
        os.makedirs(d, exist_ok=True)

    config = copy.deepcopy(config)
    config["classifier"]["checkpoint_dir"] = os.path.join(ckpt_dir, "classifier")
    config["dehazing"]["checkpoint_dir"] = os.path.join(ckpt_dir, "dehazing")
    config["routing"]["checkpoint_dir"] = os.path.join(ckpt_dir, "routing")
    config["joint_training"]["checkpoint_dir"] = os.path.join(ckpt_dir, "joint")
    config["detection"]["checkpoint_dir"] = os.path.join(ckpt_dir, "detection")
    config["evaluation"]["results_dir"] = os.path.join(results_dir, "metrics")
    config["evaluation"]["visualization_dir"] = os.path.join(results_dir, "visualizations")
    config["_logs_dir"] = logs_dir
    config["_exp_dir"] = exp_dir

    with open(os.path.join(exp_dir, "config.yaml"), "w") as f:
        yaml.dump({k: v for k, v in config.items() if not k.startswith("_")}, f)

    return exp_dir, config


def update_checkpoint_paths(config: Dict[str, Any], experiment_dir: str) -> Dict[str, Any]:
    """Point checkpoint paths at an existing experiment directory
    (reference: main.py:21-27 — but taking the dir as an argument instead of a
    hardcoded dev-machine constant)."""
    config = copy.deepcopy(config)
    ckpt = os.path.join(experiment_dir, "checkpoints")
    config["classifier"]["checkpoint_dir"] = os.path.join(ckpt, "classifier")
    config["dehazing"]["checkpoint_dir"] = os.path.join(ckpt, "dehazing")
    config["routing"]["checkpoint_dir"] = os.path.join(ckpt, "routing")
    config["joint_training"]["checkpoint_dir"] = os.path.join(ckpt, "joint")
    config["detection"]["checkpoint_dir"] = os.path.join(ckpt, "detection")
    config["evaluation"]["results_dir"] = os.path.join(experiment_dir, "results", "metrics")
    config["evaluation"]["visualization_dir"] = os.path.join(experiment_dir, "results", "visualizations")
    config["_logs_dir"] = os.path.join(experiment_dir, "logs")
    config["_exp_dir"] = experiment_dir
    return config


def use_pallas(config: Dict[str, Any]) -> bool:
    """Resolve the `tpu.use_pallas` tri-state against the active backend."""
    setting = config.get("tpu", {}).get("use_pallas", "auto")
    if setting in (True, False):
        return bool(setting)
    import jax
    return jax.default_backend() == "tpu"
