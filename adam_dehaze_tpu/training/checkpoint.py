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
    safety). Returns (state, metrics).

    Cross-device portability: an untargeted StandardCheckpointer restore
    replays the sharding metadata recorded at save time, so a checkpoint
    written on TPU fails to load on CPU ("Device TPU v5 lite0 was not
    found"). When that happens, fall back to a PyTreeCheckpointer restore
    as host numpy arrays — eval/serving on any backend works from any
    checkpoint."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    try:
        state = (ckptr.restore(path, target) if target is not None
                 else ckptr.restore(path))
    except ValueError as e:
        if "not found in jax.local_devices" not in str(e):
            raise
        pytree_ckptr = ocp.PyTreeCheckpointer()
        meta = pytree_ckptr.metadata(path).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        state = pytree_ckptr.restore(path, restore_args=restore_args)
        if target is not None:
            # The raw PyTree restore skips the structure/dtype validation a
            # targeted StandardCheckpointer restore would do — replay it so a
            # stale/mismatched checkpoint fails loudly instead of loading.
            tgt_paths = {jax.tree_util.keystr(k): v for k, v in
                         jax.tree_util.tree_leaves_with_path(target)}
            got_paths = {jax.tree_util.keystr(k): v for k, v in
                         jax.tree_util.tree_leaves_with_path(state)}
            missing = sorted(set(tgt_paths) - set(got_paths))
            if missing:
                raise ValueError(
                    f"checkpoint {path} missing keys vs target: {missing[:5]}"
                    f"{'...' if len(missing) > 5 else ''}")
            extra = sorted(set(got_paths) - set(tgt_paths))
            if extra:
                # tree_map below would die on the structure mismatch with an
                # opaque error; fail with the checkpoint-vs-target diff.
                raise ValueError(
                    f"checkpoint {path} has extra keys vs target: {extra[:5]}"
                    f"{'...' if len(extra) > 5 else ''}")
            for kstr, tleaf in tgt_paths.items():
                got = got_paths[kstr]
                tshape = getattr(tleaf, "shape", None)
                if tshape is not None and tuple(got.shape) != tuple(tshape):
                    raise ValueError(
                        f"checkpoint {path} leaf {kstr}: shape "
                        f"{tuple(got.shape)} != target {tuple(tshape)}")
            state = jax.tree_util.tree_map(
                lambda got, t: got.astype(t.dtype)
                if hasattr(t, "dtype") and got.dtype != t.dtype else got,
                state, target)
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
    # .numpy() views share the tensor's memory; copy so later in-place torch
    # mutations (e.g. BN running-stat updates) can't alias into our trees.
    return {k: v.numpy().copy() for k, v in ckpt.items()}


def convert_torch_conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_torch_linear(w: np.ndarray) -> np.ndarray:
    """torch (out, in) -> flax (in, out)."""
    return np.transpose(w)


def convert_torch_convtranspose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kH, kW) -> flax ConvTranspose
    (kH, kW, in, out) with both spatial dims flipped.

    torch's ConvTranspose2d is the gradient of a conv (cross-correlation with
    the spatially flipped kernel); flax's lax.conv_transpose default
    (transpose_kernel=False) cross-correlates without flipping, so the flip
    moves into the weights. Verified numerically against torch
    (k4 s2 p1 <-> flax padding ((2,2),(2,2)))."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


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


def load_torch_mobilenet_v3(pth_path_or_sd, flax_params, flax_batch_stats,
                            variant: str = "small"):
    """Convert torchvision mobilenet_v3_{small,large} `features` weights into
    our MobileNetV3 trees (reference classifier backbones,
    classifier.py:56-66). Returns (params, batch_stats) copies.

    torchvision layout: features.0 stem ConvBNAct; features.i InvertedResidual
    with block.j sub-convs (expand / depthwise / SqueezeExcitation fc1-fc2 /
    project); features.last 1x1 ConvBNAct."""
    import copy
    from adam_dehaze_tpu.nn.mobilenet import V3_LARGE_CONFIG, V3_SMALL_CONFIG
    sd = (_torch_state_dict(pth_path_or_sd) if isinstance(pth_path_or_sd, str)
          else pth_path_or_sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_batch_stats))
    cfgs = V3_SMALL_CONFIG if variant == "small" else V3_LARGE_CONFIG
    assigns_p, assigns_s = [], []

    def convbn(tp, fp_conv, fp_bn):
        assigns_p.append((fp_conv + ("kernel",),
                          convert_torch_conv(sd[f"{tp}.0.weight"])))
        _bn_entries(sd, f"{tp}.1", fp_bn, fp_bn, assigns_p, assigns_s)

    convbn("features.0", ("Conv_0",), ("BatchNorm_0",))
    in_ch = 16
    for i, (k, exp, c, se, hs, s) in enumerate(cfgs, start=1):
        fp = (f"InvertedResidualV3_{i - 1}",)
        j = fj = 0
        if exp != in_ch:
            convbn(f"features.{i}.block.0", fp + ("Conv_0",),
                   fp + ("BatchNorm_0",))
            j = fj = 1
        convbn(f"features.{i}.block.{j}", fp + (f"Conv_{fj}",),
               fp + (f"BatchNorm_{fj}",))
        j += 1
        fj += 1
        if se:
            se_tp = f"features.{i}.block.{j}"
            for fc in ("fc1", "fc2"):
                w = np.asarray(sd[f"{se_tp}.{fc}.weight"])  # (out,in,1,1)
                assigns_p.append((fp + ("SqueezeExcite_0", fc, "kernel"),
                                  np.transpose(w[:, :, 0, 0])))
                assigns_p.append((fp + ("SqueezeExcite_0", fc, "bias"),
                                  sd[f"{se_tp}.{fc}.bias"]))
            j += 1
        convbn(f"features.{i}.block.{j}", fp + (f"Conv_{fj}",),
               fp + (f"BatchNorm_{fj}",))
        in_ch = c
    convbn(f"features.{len(cfgs) + 1}", ("Conv_1",), ("BatchNorm_1",))

    for path, value in assigns_p:
        _set(params, path, value)
    for path, value in assigns_s:
        _set(stats, path, value)
    return params, stats


def load_torch_mobilenet_v2(pth_path_or_sd, flax_params, flax_batch_stats):
    """Convert torchvision mobilenet_v2 `features` weights into our
    MobileNetV2 trees (reference classifier backbone, classifier.py:52-55).

    torchvision layout: features.0 ConvBNReLU stem; features.1..17
    InvertedResidual (`conv.0.0/conv.0.1` expand ConvBN when t != 1,
    depthwise ConvBN, project conv + BN); features.18 1x1 ConvBNReLU."""
    import copy
    from adam_dehaze_tpu.nn.mobilenet import _V2_CONFIG
    sd = (_torch_state_dict(pth_path_or_sd) if isinstance(pth_path_or_sd, str)
          else pth_path_or_sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_batch_stats))
    assigns_p, assigns_s = [], []

    def convbn(conv_key, bn_key, fp_conv, fp_bn):
        assigns_p.append((fp_conv + ("kernel",),
                          convert_torch_conv(sd[conv_key])))
        _bn_entries(sd, bn_key, fp_bn, fp_bn, assigns_p, assigns_s)

    convbn("features.0.0.weight", "features.0.1", ("Conv_0",),
           ("BatchNorm_0",))
    ti = 1
    for t, _c, n, _s in _V2_CONFIG:
        for _ in range(n):
            fp = (f"InvertedResidual_{ti - 1}",)
            fj = 0
            if t != 1:
                convbn(f"features.{ti}.conv.0.0.weight",
                       f"features.{ti}.conv.0.1",
                       fp + ("Conv_0",), fp + ("BatchNorm_0",))
                dw, fj = 1, 1
            else:
                dw = 0
            convbn(f"features.{ti}.conv.{dw}.0.weight",
                   f"features.{ti}.conv.{dw}.1",
                   fp + (f"Conv_{fj}",), fp + (f"BatchNorm_{fj}",))
            convbn(f"features.{ti}.conv.{dw + 1}.weight",
                   f"features.{ti}.conv.{dw + 2}",
                   fp + (f"Conv_{fj + 1}",), fp + (f"BatchNorm_{fj + 1}",))
            ti += 1
    convbn(f"features.{ti}.0.weight", f"features.{ti}.1", ("Conv_1",),
           ("BatchNorm_1",))

    for path, value in assigns_p:
        _set(params, path, value)
    for path, value in assigns_s:
        _set(stats, path, value)
    return params, stats


def load_torch_efficientnet(pth_path_or_sd, flax_params, flax_batch_stats,
                            variant: str = "b0"):
    """Convert a timm-layout EfficientNet-B0..B3 state_dict into our
    EfficientNet trees (reference classifier backbone via timm,
    classifier.py:38-50). Returns (params, batch_stats) copies.

    timm layout: conv_stem/bn1; blocks.0.i DepthwiseSeparableConv (conv_dw,
    bn1, se.conv_reduce/expand, conv_pw, bn2); blocks.1..6.i
    InvertedResidual (conv_pw, bn1, conv_dw, bn2, se.*, conv_pwl, bn3);
    conv_head/bn2. timm's default pad_type is static symmetric padding
    (((s-1) + (k-1)) // 2), which equals our k//2 for every block shape, so
    conversion is numerically exact up to BN epsilon (we keep the paper's
    1e-3; timm defaults to torch's 1e-5 — not recorded in state_dicts,
    effect < 1e-3 relative on normalized activations)."""
    import copy
    from adam_dehaze_tpu.nn.efficientnet import (
        _B0_CONFIG,
        round_filters,
        round_repeats,
        SCALING,
    )
    sd = (_torch_state_dict(pth_path_or_sd) if isinstance(pth_path_or_sd, str)
          else pth_path_or_sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_batch_stats))
    _width, depth = SCALING[variant]
    assigns_p, assigns_s = [], []

    def conv(key, fp):
        assigns_p.append((fp + ("kernel",), convert_torch_conv(sd[key])))

    def bn(key, fp):
        _bn_entries(sd, key, fp, fp, assigns_p, assigns_s)

    conv("conv_stem.weight", ("Conv_0",))
    bn("bn1", ("BatchNorm_0",))
    mb = 0
    for stage, (expand, _ch, repeats, _stride, _k) in enumerate(_B0_CONFIG):
        for i in range(round_repeats(repeats, depth)):
            tp = f"blocks.{stage}.{i}"
            fp = (f"MBConv_{mb}",)
            se = fp + ("SqueezeExcite_0",)
            if expand == 1:
                conv(f"{tp}.conv_dw.weight", fp + ("Conv_0",))
                bn(f"{tp}.bn1", fp + ("BatchNorm_0",))
                conv(f"{tp}.conv_pw.weight", fp + ("Conv_1",))
                bn(f"{tp}.bn2", fp + ("BatchNorm_1",))
            else:
                conv(f"{tp}.conv_pw.weight", fp + ("Conv_0",))
                bn(f"{tp}.bn1", fp + ("BatchNorm_0",))
                conv(f"{tp}.conv_dw.weight", fp + ("Conv_1",))
                bn(f"{tp}.bn2", fp + ("BatchNorm_1",))
                conv(f"{tp}.conv_pwl.weight", fp + ("Conv_2",))
                bn(f"{tp}.bn3", fp + ("BatchNorm_2",))
            for t_name, f_name in (("conv_reduce", "Conv_0"),
                                   ("conv_expand", "Conv_1")):
                conv(f"{tp}.se.{t_name}.weight", se + (f_name,))
                assigns_p.append((se + (f_name, "bias"),
                                  sd[f"{tp}.se.{t_name}.bias"]))
            mb += 1
    conv("conv_head.weight", ("Conv_1",))
    bn("bn2", ("BatchNorm_1",))

    for path, value in assigns_p:
        _set(params, path, value)
    for path, value in assigns_s:
        _set(stats, path, value)
    return params, stats


# ---------------------------------------------------------------------------
# Branch / classifier / joint converters (the reference's actual trained
# artifacts: classifier, three branch models, joint 5-state checkpoint —
# reference train_joint.py:272-283, utils/helpers.py:31-44).
# ---------------------------------------------------------------------------

def _block_assigns(sd, kind, tp, fp, out_p, out_s):
    """Emit (flax_path, value) assignments for one reference block.

    kinds (reference models/dehazing/base_model.py):
      CB   — ConvBlock `{tp}.block.0` conv (+ optional bias), `.block.1` BN
      RES  — ResidualBlock `{tp}.conv1` / `{tp}.conv2` ConvBlocks
      ATT  — AttentionBlock `{tp}.fc.{0,2}` 1x1 convs, `{tp}.conv_spatial`
      UP   — ConvTranspose `{tp}.0` + BatchNorm `{tp}.1` (an UpBlock here)
      CONV — bare nn.Conv2d `{tp}.weight/.bias`
    """
    if kind == "CB":
        out_p.append((fp + ("Conv_0", "kernel"),
                      convert_torch_conv(sd[f"{tp}.block.0.weight"])))
        if f"{tp}.block.0.bias" in sd:
            out_p.append((fp + ("Conv_0", "bias"), sd[f"{tp}.block.0.bias"]))
        if f"{tp}.block.1.weight" in sd:
            _bn_entries(sd, f"{tp}.block.1", fp + ("BatchNorm_0",),
                        fp + ("BatchNorm_0",), out_p, out_s)
    elif kind == "RES":
        _block_assigns(sd, "CB", f"{tp}.conv1", fp + ("ConvBlock_0",), out_p, out_s)
        _block_assigns(sd, "CB", f"{tp}.conv2", fp + ("ConvBlock_1",), out_p, out_s)
    elif kind == "ATT":
        w0 = np.asarray(sd[f"{tp}.fc.0.weight"])  # (hidden, C, 1, 1)
        w1 = np.asarray(sd[f"{tp}.fc.2.weight"])  # (C, hidden, 1, 1)
        out_p.append((fp + ("Dense_0", "kernel"), np.transpose(w0[:, :, 0, 0])))
        out_p.append((fp + ("Dense_1", "kernel"), np.transpose(w1[:, :, 0, 0])))
        out_p.append((fp + ("spatial_conv",),
                      convert_torch_conv(sd[f"{tp}.conv_spatial.weight"])))
    elif kind == "UP":
        out_p.append((fp + ("ConvTranspose_0", "kernel"),
                      convert_torch_convtranspose(sd[f"{tp}.0.weight"])))
        out_p.append((fp + ("ConvTranspose_0", "bias"), sd[f"{tp}.0.bias"]))
        _bn_entries(sd, f"{tp}.1", fp + ("BatchNorm_0",), fp + ("BatchNorm_0",),
                    out_p, out_s)
    elif kind == "CONV":
        out_p.append((fp + ("kernel",), convert_torch_conv(sd[f"{tp}.weight"])))
        if f"{tp}.bias" in sd:
            out_p.append((fp + ("bias",), sd[f"{tp}.bias"]))
    else:  # pragma: no cover
        raise ValueError(f"Unknown block kind {kind}")


def _branch_layout(kind: str, sd) -> list:
    """Ordered (block_kind, torch_prefix, flax_path) table per branch variant.

    Mappings follow the reference module registration order against our flax
    call-order auto-names (reference: models/dehazing/low_intensity.py:5-140,
    medium_intensity.py:5-215, high_intensity.py:6-239)."""
    if kind == "lightweight":
        n_res = len({k.split(".")[1] for k in sd if k.startswith("residual_blocks.")})
        t = [("CB", "init_conv", ("ConvBlock_0",))]
        t += [("RES", f"residual_blocks.{i}", (f"ResidualBlock_{i}",))
              for i in range(n_res)]
        t += [("CB", "output_conv.0", ("ConvBlock_1",)),
              ("CONV", "output_conv.1", ("Conv_0",))]
        return t
    if kind == "low_unet":
        n_bott = len({k.split(".")[1] for k in sd if k.startswith("bottleneck.")})
        t = [("CB", "init_conv", ("ConvBlock_0",)),
             ("CB", "down1.0", ("ConvBlock_1",)),
             ("RES", "down1.1", ("ResidualBlock_0",))]
        t += [("RES", f"bottleneck.{i}", (f"ResidualBlock_{i + 1}",))
              for i in range(n_bott)]
        t += [("UP", "up1", ("UpBlock_0",)),
              ("CB", "output_conv.0", ("ConvBlock_2",)),
              ("CB", "output_conv.1", ("ConvBlock_3",)),
              ("CONV", "output_conv.2", ("Conv_0",))]
        return t
    if kind == "medium":
        return [
            ("CB", "init_conv", ("ConvBlock_0",)),
            ("CB", "encoder.0.0", ("ConvBlock_1",)),
            ("RES", "encoder.0.1", ("ResidualBlock_0",)),
            ("RES", "encoder.0.2", ("ResidualBlock_1",)),
            ("CB", "encoder.1.0", ("ConvBlock_2",)),
            ("RES", "encoder.1.1", ("ResidualBlock_2",)),
            ("RES", "encoder.1.2", ("ResidualBlock_3",)),
            ("RES", "bottleneck.0", ("ResidualBlock_4",)),
            ("RES", "bottleneck.1", ("ResidualBlock_5",)),
            ("UP", "decoder.0", ("UpBlock_0",)),
            ("RES", "decoder.0.3", ("ResidualBlock_6",)),
            ("UP", "decoder.1", ("UpBlock_1",)),
            ("RES", "decoder.1.3", ("ResidualBlock_7",)),
            ("CB", "output_conv.0", ("ConvBlock_3",)),
            ("CB", "output_conv.1", ("ConvBlock_4",)),
            ("CONV", "output_conv.2", ("Conv_0",)),
        ]
    if kind == "corun":
        n_res = len({k.split(".")[1] for k in sd if k.startswith("residual_blocks.")})
        t = [("CB", "init_conv", ("ConvBlock_0",)),
             ("CB", "scale1_conv", ("ConvBlock_1",)),
             ("CB", "scale2_conv.1", ("ConvBlock_2",)),
             ("CB", "scale3_conv.1", ("ConvBlock_3",)),
             ("CB", "fusion_conv", ("ConvBlock_4",))]
        t += [("RES", f"residual_blocks.{i}", (f"ResidualBlock_{i}",))
              for i in range(n_res)]
        t += [("CB", "output_conv.0", ("ConvBlock_5",)),
              ("CONV", "output_conv.1", ("Conv_0",))]
        return t
    if kind == "high":
        return [
            ("CB", "detail_branch.0", ("ConvBlock_0",)),
            ("CB", "detail_branch.1", ("ConvBlock_1",)),
            ("CONV", "detail_branch.2", ("Conv_0",)),
            ("CB", "init_conv", ("ConvBlock_2",)),
            ("CB", "encoder.0.0", ("ConvBlock_3",)),
            ("RES", "encoder.0.1", ("ResidualBlock_0",)),
            ("RES", "encoder.0.2", ("ResidualBlock_1",)),
            ("ATT", "encoder.0.3", ("AttentionBlock_0",)),
            ("CB", "encoder.1.0", ("ConvBlock_4",)),
            ("RES", "encoder.1.1", ("ResidualBlock_2",)),
            ("RES", "encoder.1.2", ("ResidualBlock_3",)),
            ("ATT", "encoder.1.3", ("AttentionBlock_1",)),
            ("RES", "bottleneck.0", ("ResidualBlock_4",)),
            ("ATT", "bottleneck.1", ("AttentionBlock_2",)),
            ("RES", "bottleneck.2", ("ResidualBlock_5",)),
            ("ATT", "bottleneck.3", ("AttentionBlock_3",)),
            ("UP", "decoder.0", ("UpBlock_0",)),
            ("RES", "decoder.0.3", ("ResidualBlock_6",)),
            ("ATT", "decoder.0.4", ("AttentionBlock_4",)),
            ("UP", "decoder.1", ("UpBlock_1",)),
            ("RES", "decoder.1.3", ("ResidualBlock_7",)),
            ("ATT", "decoder.1.4", ("AttentionBlock_5",)),
            ("CB", "output_conv.0", ("ConvBlock_5",)),
            ("CB", "output_conv.1", ("ConvBlock_6",)),
            ("CONV", "output_conv.2", ("Conv_1",)),
        ]
    if kind == "dual_branch":
        return [
            ("CB", "global_branch.0", ("ConvBlock_0",)),
            ("RES", "global_branch.2", ("ResidualBlock_0",)),
            ("ATT", "global_branch.3", ("AttentionBlock_0",)),
            ("RES", "global_branch.5", ("ResidualBlock_1",)),
            ("ATT", "global_branch.6", ("AttentionBlock_1",)),
            ("RES", "global_branch.7", ("ResidualBlock_2",)),
            ("RES", "global_branch.9", ("ResidualBlock_3",)),
            ("CB", "global_branch.11", ("ConvBlock_1",)),
            ("CB", "local_branch.0", ("ConvBlock_2",)),
            ("RES", "local_branch.1", ("ResidualBlock_4",)),
            ("RES", "local_branch.2", ("ResidualBlock_5",)),
            ("CB", "local_branch.3", ("ConvBlock_3",)),
            ("CB", "transmission_branch.0", ("ConvBlock_4",)),
            ("CB", "transmission_branch.1", ("ConvBlock_5",)),
            ("CONV", "transmission_branch.2", ("Conv_0",)),
            ("CB", "fusion_conv.0", ("ConvBlock_6",)),
            ("CONV", "fusion_conv.1", ("Conv_1",)),
        ]
    raise ValueError(f"Unknown branch kind {kind}")


BRANCH_KINDS = ("lightweight", "low_unet", "medium", "corun", "high",
                "dual_branch")


def branch_kind_for(level: str, model_type: str) -> str:
    """Map a config (level, model_type) to a converter kind, mirroring the
    reference factories (low_intensity.py:127-140, medium_intensity.py:201-215,
    high_intensity.py:225-239)."""
    if level == "low":
        return "lightweight" if model_type == "lightweight" else "low_unet"
    if level == "medium":
        return "corun" if model_type == "corun" else "medium"
    return "dual_branch" if model_type == "dual_branch" else "high"


def load_torch_branch(pth_path_or_sd, kind: str, flax_params, flax_batch_stats):
    """Convert a reference branch-model state_dict into our flax trees.

    kind: one of BRANCH_KINDS. Returns (params, batch_stats) copies."""
    import copy
    sd = (_torch_state_dict(pth_path_or_sd) if isinstance(pth_path_or_sd, str)
          else pth_path_or_sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_batch_stats))
    assigns_p, assigns_s = [], []
    for bkind, tp, fp in _branch_layout(kind, sd):
        _block_assigns(sd, bkind, tp, fp, assigns_p, assigns_s)
    if "skip_alpha" in sd:  # lightweight's learnable global skip
        assigns_p.append((("skip_alpha",), np.asarray(sd["skip_alpha"])))
    for path, value in assigns_p:
        _set(params, path, value)
    for path, value in assigns_s:
        _set(stats, path, value)
    return params, stats


def load_torch_classifier(pth_path_or_sd, flax_params, flax_batch_stats,
                          model_name: str = "resnet18"):
    """Convert a reference FogIntensityClassifier state_dict (backbone.* +
    classifier.* head, reference models/classifier.py:22-78) into our
    FogIntensityClassifier trees. Returns (params, batch_stats)."""
    import copy
    sd = (_torch_state_dict(pth_path_or_sd) if isinstance(pth_path_or_sd, str)
          else pth_path_or_sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    if model_name.startswith("resnet"):
        stage_sizes = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
                       "resnet50": (3, 4, 6, 3)}[model_name]
        bb_name = next(k for k in flax_params if k.startswith("ResNet"))
        bb_params, bb_stats = load_torch_resnet(
            backbone_sd, flax_params[bb_name], flax_batch_stats[bb_name],
            stage_sizes=stage_sizes, bottleneck=(model_name == "resnet50"))
    elif model_name == "mobilenet_v2":
        bb_name = next(k for k in flax_params if k.startswith("MobileNetV2"))
        bb_params, bb_stats = load_torch_mobilenet_v2(
            backbone_sd, flax_params[bb_name], flax_batch_stats[bb_name])
    elif model_name.startswith("mobilenet_v3"):
        bb_name = next(k for k in flax_params if k.startswith("MobileNetV3"))
        bb_params, bb_stats = load_torch_mobilenet_v3(
            backbone_sd, flax_params[bb_name], flax_batch_stats[bb_name],
            variant=model_name.rsplit("_", 1)[-1])
    elif model_name.startswith("efficientnet_"):
        bb_name = next(k for k in flax_params if k.startswith("EfficientNet"))
        bb_params, bb_stats = load_torch_efficientnet(
            backbone_sd, flax_params[bb_name], flax_batch_stats[bb_name],
            variant=model_name.rsplit("_", 1)[-1])
    else:
        raise ValueError(f"unknown classifier backbone: {model_name}")
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_batch_stats))
    params[bb_name] = bb_params
    stats[bb_name] = bb_stats
    # Head: torch Sequential(Dropout, Linear, ReLU, Dropout, Linear) ->
    # flax Dense_0 / Dense_1 (reference classifier.py:72-78).
    _set(params, ("Dense_0", "kernel"), convert_torch_linear(sd["classifier.1.weight"]))
    _set(params, ("Dense_0", "bias"), sd["classifier.1.bias"])
    _set(params, ("Dense_1", "kernel"), convert_torch_linear(sd["classifier.4.weight"]))
    _set(params, ("Dense_1", "bias"), sd["classifier.4.bias"])
    return params, stats


def load_torch_gate(pth_path_or_sd, flax_params):
    """Convert the reference GatedRouter gate MLP (gate_network.{0,3,5},
    reference routing.py:155-163) into our GatedRouter Dense_0/1/2 params.
    Returns a params copy (router-level; classifier/branch subtrees are
    converted by their own loaders)."""
    import copy
    sd = (_torch_state_dict(pth_path_or_sd) if isinstance(pth_path_or_sd, str)
          else pth_path_or_sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    for ti, fi in ((0, 0), (3, 1), (5, 2)):
        _set(params, (f"Dense_{fi}", "kernel"),
             convert_torch_linear(sd[f"gate_network.{ti}.weight"]))
        _set(params, (f"Dense_{fi}", "bias"), sd[f"gate_network.{ti}.bias"])
    return params


def load_torch_joint(pth_path_or_ckpt, router_variables, config):
    """Convert the reference joint 5-state checkpoint
    ({router,low,medium,high,classifier}_state_dict, reference
    train_joint.py:272-283) into variables for our create_router module tree
    (top-level keys: classifier, models_low/medium/high [, Dense_0..2]).

    Returns {params, batch_stats}. The torch optimizer state is not
    convertible (Adam moments are torch-layout) and is ignored."""
    import copy
    if isinstance(pth_path_or_ckpt, str):
        import torch
        ckpt = torch.load(pth_path_or_ckpt, map_location="cpu",
                          weights_only=False)
        ckpt = {k: ({kk: vv.numpy() for kk, vv in v.items()}
                    if k.endswith("_state_dict") and k != "optimizer_state_dict"
                    else v)
                for k, v in ckpt.items()}
    else:
        ckpt = pth_path_or_ckpt
    params = copy.deepcopy(jax.tree_util.tree_map(
        np.asarray, router_variables["params"]))
    stats = copy.deepcopy(jax.tree_util.tree_map(
        np.asarray, router_variables["batch_stats"]))

    model_name = config["classifier"]["model"]
    params["classifier"], stats["classifier"] = load_torch_classifier(
        ckpt["classifier_state_dict"], params["classifier"],
        stats["classifier"], model_name)
    for level in ("low", "medium", "high"):
        kind = branch_kind_for(level, config["dehazing"][level]["model_type"])
        key = f"models_{level}"
        params[key], stats[key] = load_torch_branch(
            ckpt[f"{level}_model_state_dict"], kind, params[key], stats[key])
    if config["routing"]["type"] == "gated":
        params = load_torch_gate(ckpt["router_state_dict"], params)
    return {"params": params, "batch_stats": stats}


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


def load_torch_fcos(pth_path_or_sd, detector_variables):
    """Convert a torchvision `fcos_resnet50_fpn` state_dict into variables
    for FCOSDetector(torchvision_compat=True) (models/detection.py).

    The reference loads its detector pretrained from torchvision and freezes
    it (reference: models/detection.py:23-51); this is the TPU-side of that
    path for the day COCO weights are available in the environment. Layout
    handled:

    - backbone.body.*            -> ResNet_0 (bottleneck resnet50)
    - backbone.fpn.inner_blocks  -> FPN_0.lateral{i}   (flat or nested .0 keys)
    - backbone.fpn.layer_blocks  -> FPN_0.smooth{i}
    - backbone.fpn.extra_blocks.p6/p7 -> FPN_0.p6/p7
    - head.classification_head.conv + cls_logits -> FCOSHead_0.cls{i}/
      cls_gn{i}/cls_out; head.regression_head.conv + bbox_reg/bbox_ctrness
      -> reg{i}/reg_gn{i}/reg_out/ctr_out

    torchvision's BoxLinearCoder(normalize_by_size=True) with per-level
    anchor size == stride makes its raw offsets x stride equal our decode's
    pixel offsets, so no weight rescaling is needed.

    Returns {"params": ..., "batch_stats": ...} deep copies.
    """
    import copy
    sd = (_torch_state_dict(pth_path_or_sd) if isinstance(pth_path_or_sd, str)
          else pth_path_or_sd)
    params = copy.deepcopy(jax.tree_util.tree_map(
        np.asarray, detector_variables["params"]))
    stats = copy.deepcopy(jax.tree_util.tree_map(
        np.asarray, detector_variables["batch_stats"]))

    body = {k[len("backbone.body."):]: v for k, v in sd.items()
            if k.startswith("backbone.body.")}
    params["ResNet_0"], stats["ResNet_0"] = load_torch_resnet(
        body, params["ResNet_0"], stats["ResNet_0"],
        stage_sizes=(3, 4, 6, 3), bottleneck=True)

    def conv_wb(prefix):
        """Fetch (weight, bias) accepting both the flat (`prefix.weight`)
        and the Conv2dNormActivation-nested (`prefix.0.weight`) key forms
        torchvision has shipped across versions."""
        for p in (prefix, f"{prefix}.0"):
            if f"{p}.weight" in sd:
                return sd[f"{p}.weight"], sd.get(f"{p}.bias")
        raise KeyError(f"no conv weight under {prefix}")

    fpn = params["FPN_0"]
    for i in range(3):
        w, b = conv_wb(f"backbone.fpn.inner_blocks.{i}")
        _set(fpn, (f"lateral{i}", "kernel"), convert_torch_conv(w))
        _set(fpn, (f"lateral{i}", "bias"), b)
        w, b = conv_wb(f"backbone.fpn.layer_blocks.{i}")
        _set(fpn, (f"smooth{i}", "kernel"), convert_torch_conv(w))
        _set(fpn, (f"smooth{i}", "bias"), b)
    for lvl in ("p6", "p7"):
        w, b = conv_wb(f"backbone.fpn.extra_blocks.{lvl}")
        _set(fpn, (lvl, "kernel"), convert_torch_conv(w))
        _set(fpn, (lvl, "bias"), b)

    head = params["FCOSHead_0"]

    def tower(torch_prefix, conv_fmt, gn_fmt):
        # Tower Sequential comes in two historical layouts: nested
        # (conv.{i}.0 conv + conv.{i}.1 GN) and flat interleaved
        # (conv.{3i} conv + conv.{3i+1} GN + ReLU).
        nested = f"{torch_prefix}.conv.0.0.weight" in sd
        for i in range(4):
            cw = f"{torch_prefix}.conv.{i}.0" if nested \
                else f"{torch_prefix}.conv.{3 * i}"
            gn = f"{torch_prefix}.conv.{i}.1" if nested \
                else f"{torch_prefix}.conv.{3 * i + 1}"
            _set(head, (conv_fmt.format(i), "kernel"),
                 convert_torch_conv(sd[f"{cw}.weight"]))
            _set(head, (conv_fmt.format(i), "bias"), sd[f"{cw}.bias"])
            _set(head, (gn_fmt.format(i), "scale"), sd[f"{gn}.weight"])
            _set(head, (gn_fmt.format(i), "bias"), sd[f"{gn}.bias"])

    tower("head.classification_head", "cls{}", "cls_gn{}")
    tower("head.regression_head", "reg{}", "reg_gn{}")
    _set(head, ("cls_out", "kernel"),
         convert_torch_conv(sd["head.classification_head.cls_logits.weight"]))
    _set(head, ("cls_out", "bias"),
         sd["head.classification_head.cls_logits.bias"])
    _set(head, ("reg_out", "kernel"),
         convert_torch_conv(sd["head.regression_head.bbox_reg.weight"]))
    _set(head, ("reg_out", "bias"), sd["head.regression_head.bbox_reg.bias"])
    _set(head, ("ctr_out", "kernel"),
         convert_torch_conv(sd["head.regression_head.bbox_ctrness.weight"]))
    _set(head, ("ctr_out", "bias"),
         sd["head.regression_head.bbox_ctrness.bias"])
    return {"params": params, "batch_stats": stats}
