"""Orbax checkpointing with the reference's logical layout.

Layout (reference: utils/helpers.py:31-44, train_*.py):
  {ckpt_dir}/best_model            — best by the stage's metric
  {ckpt_dir}/checkpoint_epoch_N    — every 5 epochs
Each checkpoint holds {epoch, params, batch_stats, opt_state, metrics}.
`find_latest_checkpoint` powers a REAL `--resume` (the reference defines the
flag but never reads it, main.py:50-51; grep shows no use).
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_EPOCH_RE = re.compile(r"checkpoint_epoch_(\d+)$")


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, name: str, state: Dict[str, Any],
                    metrics: Optional[Dict[str, float]] = None) -> str:
    """Save a state pytree as {ckpt_dir}/{name} (+ metrics JSON sidecar)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = _checkpointer()
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    if metrics is not None:
        with open(path + ".metrics.json", "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f, indent=2)
    return path


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None
                    ) -> Tuple[Dict[str, Any], Dict[str, float]]:
    """Restore a checkpoint (optionally against a target tree for dtype/shape
    safety). Returns (state, metrics)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    state = ckptr.restore(path, target) if target is not None else ckptr.restore(path)
    metrics = {}
    mpath = path + ".metrics.json"
    if os.path.exists(mpath):
        with open(mpath) as f:
            metrics = json.load(f)
    return state, metrics


def find_latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Most recent epoch checkpoint (falling back to best_model) for resume."""
    if not os.path.isdir(ckpt_dir):
        return None
    best_epoch, best_path = -1, None
    for entry in os.listdir(ckpt_dir):
        m = _EPOCH_RE.match(entry)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best_path = os.path.join(ckpt_dir, entry)
    if best_path is None:
        cand = os.path.join(ckpt_dir, "best_model")
        if os.path.isdir(cand):
            return cand
    return best_path


def best_model_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "best_model")


# ---------------------------------------------------------------------------
# Torch-weight converters (gated: torch must be importable and a .pth file
# supplied). These exist for parity testing against reference checkpoints
# (SURVEY.md §5 "converter from .pth").
# ---------------------------------------------------------------------------

def _torch_state_dict(pth_path: str):
    import torch
    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    return {k: v.numpy() for k, v in ckpt.items()}


def convert_torch_conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_torch_linear(w: np.ndarray) -> np.ndarray:
    """torch (out, in) -> flax (in, out)."""
    return np.transpose(w)


def load_torch_resnet(pth_path: str, flax_params, flax_batch_stats):
    """Convert a torchvision-style ResNet state_dict into our flax trees.

    Best-effort name mapping by traversal order of conv/BN tensors; raises if
    the shapes do not line up. Gated: only usable when a .pth is provided.
    """
    sd = _torch_state_dict(pth_path)
    convs = [v for k, v in sd.items() if k.endswith("weight") and v.ndim == 4]
    flat_params = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    flax_convs = [(p, v) for p, v in flat_params
                  if getattr(v, "ndim", 0) == 4]
    if len(convs) != len(flax_convs):
        raise ValueError(
            f"Conv count mismatch: torch {len(convs)} vs flax {len(flax_convs)}")
    raise NotImplementedError(
        "Full name-mapped conversion lands with detection-weight support; "
        "conv-count validation passed.")
