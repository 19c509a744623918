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


def _set(tree, path, value, expect_shape=True):
    node = tree
    for p in path[:-1]:
        node = node[p]
    if expect_shape and tuple(node[path[-1]].shape) != tuple(value.shape):
        raise ValueError(f"Shape mismatch at {'/'.join(path)}: "
                         f"{node[path[-1]].shape} vs {value.shape}")
    node[path[-1]] = value


def _bn_entries(sd, prefix, params_path, stats_path, out_p, out_s):
    out_p.append((params_path + ("scale",), sd[f"{prefix}.weight"]))
    out_p.append((params_path + ("bias",), sd[f"{prefix}.bias"]))
    out_s.append((stats_path + ("mean",), sd[f"{prefix}.running_mean"]))
    out_s.append((stats_path + ("var",), sd[f"{prefix}.running_var"]))


def load_torch_resnet(pth_path_or_sd, flax_params, flax_batch_stats,
                      stage_sizes=(2, 2, 2, 2), bottleneck: bool = False):
    """Convert a torchvision-style ResNet state_dict into our flax trees.

    Returns (params, batch_stats) deep copies with converted weights. Handles
    the backbone only (fc excluded, matching the reference's nn.Identity
    replacement, classifier.py:36). Gated: requires torch + a .pth (or a
    preloaded {name: ndarray} dict for testing).
    """
    import copy
    sd = (_torch_state_dict(pth_path_or_sd) if isinstance(pth_path_or_sd, str)
          else pth_path_or_sd)
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_batch_stats))
    block_name = "Bottleneck" if bottleneck else "BasicBlock"
    n_convs_in_block = 3 if bottleneck else 2

    assigns_p, assigns_s = [], []
    assigns_p.append((("Conv_0", "kernel"), convert_torch_conv(sd["conv1.weight"])))
    _bn_entries(sd, "bn1", ("BatchNorm_0",), ("BatchNorm_0",),
                assigns_p, assigns_s)

    block_idx = 0
    for li, n_blocks in enumerate(stage_sizes, start=1):
        for b in range(n_blocks):
            tp = f"layer{li}.{b}"
            fp = f"{block_name}_{block_idx}"
            for ci in range(n_convs_in_block):
                assigns_p.append(((fp, f"Conv_{ci}", "kernel"),
                                  convert_torch_conv(sd[f"{tp}.conv{ci + 1}.weight"])))
                _bn_entries(sd, f"{tp}.bn{ci + 1}",
                            (fp, f"BatchNorm_{ci}"), (fp, f"BatchNorm_{ci}"),
                            assigns_p, assigns_s)
            if f"{tp}.downsample.0.weight" in sd:
                ci = n_convs_in_block
                assigns_p.append(((fp, f"Conv_{ci}", "kernel"),
                                  convert_torch_conv(sd[f"{tp}.downsample.0.weight"])))
                _bn_entries(sd, f"{tp}.downsample.1",
                            (fp, f"BatchNorm_{ci}"), (fp, f"BatchNorm_{ci}"),
                            assigns_p, assigns_s)
            block_idx += 1

    for path, value in assigns_p:
        _set(params, path, value)
    for path, value in assigns_s:
        _set(stats, path, value)
    return params, stats


_VGG16_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG16_NAMES = ("conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1",
                "conv3_2", "conv3_3", "conv4_1", "conv4_2", "conv4_3",
                "conv5_1", "conv5_2", "conv5_3")


def load_torch_vgg16(pth_path_or_sd, flax_params):
    """Convert torchvision VGG16 `features` weights into VGG16Features params.
    Only the convs present in the flax tree (up to the deepest tap) are
    filled."""
    import copy
    sd = (_torch_state_dict(pth_path_or_sd) if isinstance(pth_path_or_sd, str)
          else pth_path_or_sd)
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    inner = params["params"] if "params" in params else params
    for idx, name in zip(_VGG16_TORCH_CONV_IDX, _VGG16_NAMES):
        if name not in inner:
            continue
        key = f"features.{idx}.weight"
        if key not in sd:
            key = f"{idx}.weight"
        _set(inner, (name, "kernel"), convert_torch_conv(sd[key]))
        bkey = key.replace("weight", "bias")
        _set(inner, (name, "bias"), sd[bkey])
    return params


_ALEXNET_TORCH_CONV_IDX = (0, 3, 6, 8, 10)


def load_torch_alexnet(pth_path_or_sd, flax_params):
    """Convert torchvision AlexNet `features` weights into our
    AlexNetFeatures params (conv1..conv5) — the LPIPS trunk. The lpips
    package's own checkpoints hold only the linear heads (see
    load_torch_lpips); the trunk comes from a torchvision alexnet .pth."""
    import copy
    sd = (_torch_state_dict(pth_path_or_sd) if isinstance(pth_path_or_sd, str)
          else pth_path_or_sd)
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    inner = params["params"] if "params" in params else params
    # The trunk may be nested under an AlexNetFeatures submodule (LPIPS tree).
    target = inner
    for k in list(inner):
        if k.startswith("AlexNetFeatures"):
            target = inner[k]
            break
    for i, idx in enumerate(_ALEXNET_TORCH_CONV_IDX, start=1):
        key = f"features.{idx}.weight"
        if key not in sd:
            key = f"{idx}.weight"
        _set(target, (f"conv{i}", "kernel"), convert_torch_conv(sd[key]))
        _set(target, (f"conv{i}", "bias"), sd[key.replace("weight", "bias")])
    return params


def load_torch_lpips(pth_path_or_sd, flax_params):
    """Convert `lpips` package linear-head weights (lin0..lin4) into our
    LPIPS params (losses/lpips.py). AlexNet trunk weights convert separately
    via the alexnet keys if present."""
    import copy
    sd = (_torch_state_dict(pth_path_or_sd) if isinstance(pth_path_or_sd, str)
          else pth_path_or_sd)
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    inner = params["params"] if "params" in params else params
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                w = np.asarray(sd[key]).reshape(-1)  # (1, C, 1, 1) -> (C,)
                _set(inner, (f"lin{i}",), w)
                break
    return params
