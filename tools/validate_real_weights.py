#!/usr/bin/env python
"""Day-one validation of real reference checkpoints: convert -> restore ->
forward-parity -> tiny eval, in ONE command.

The reference's published weights (classifier/branch/joint .pth, torchvision
FCOS COCO weights) are egress-blocked in this environment, so the converters
(tools/convert_reference_checkpoint.py) have only ever been exercised against
synthetic/random state dicts. This tool makes weight availability a
zero-thought event (VERDICT r4 item 7b): the day a real `.pth` appears, run

    python tools/validate_real_weights.py --kind classifier --pth best.pth
    python tools/validate_real_weights.py --kind branch --level medium \
        --pth medium/best_model.pth
    python tools/validate_real_weights.py --kind joint --pth joint/best.pth
    python tools/validate_real_weights.py --kind fcos --pth fcos_coco.pth

and get one PASS/FAIL JSON line covering the whole path. Until then,

    python tools/validate_real_weights.py --kind classifier --selftest

builds a faithful reference-FORMAT .pth from the ACTUAL reference torch
modules (/root/reference models/classifier.py + models/dehazing/*, imported
with the torchvision/timm shims from tests/test_torch_parity.py; random
weights, reference checkpoint dict layout train_joint.py:272-283) and runs
the IDENTICAL pipeline — proving the harness end-to-end.

What runs (all host-side; JAX pinned to CPU — verify-skill golden rule):
1. build or accept the .pth; for classifier/branch/joint, load it into the
   reference torch module and record eval-mode forward outputs on a fixed
   input (works for real weights too — torch is in-env).
2. run the converter CLI in a SUBPROCESS (the real user path, not a
   function call).
3. restore the converted orbax checkpoint in a FRESH subprocess through the
   package API, forward the same input at f32/highest precision, diff
   against the recorded torch outputs (threshold 1e-4, the parity suite's
   ATOL), and run a tiny adaptive eval on synthetic fog triplets.
4. print one JSON line {kind, ok, forward_max_abs_diff, eval...}.

fcos has no in-env torch reference (torchvision is absent), so its parity is
layout + finite-forward + tiny-eval only — stated in the output as
"parity": "layout_only" (PARITY.md documents the same cap).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
REF = "/root/reference"


def _shim_torchvision():
    """Install the exact-naming torchvision/timm replicas so the reference
    classifier imports (same shim as tests/test_torch_parity.py's fixture)."""
    import types

    from test_torch_parity import _TimmEffB0, _TVMobileNetV2, _TVResNet18
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.resnet18 = lambda pretrained=False: _TVResNet18()
    tvm.mobilenet_v2 = lambda pretrained=False: _TVMobileNetV2()
    tv.models = tvm
    timm = types.ModuleType("timm")
    timm.create_model = lambda name, pretrained=False: _TimmEffB0()
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tvm)
    sys.modules.setdefault("timm", timm)


def _ref_classifier(config):
    _shim_torchvision()
    sys.path.insert(0, REF)
    try:
        import models.classifier as ref_clf
        return ref_clf.FogIntensityClassifier(
            model_name=config["classifier"]["model"], num_classes=3,
            pretrained=False)
    finally:
        sys.path.remove(REF)


def _ref_branch(level, config):
    sys.path.insert(0, REF)
    try:
        import models.dehazing.high_intensity as high
        import models.dehazing.low_intensity as low
        import models.dehazing.medium_intensity as med
        mt = config["dehazing"][level]["model_type"]
        if level == "low":
            return (low.LightweightDehazeModel() if mt == "lightweight"
                    else low.EncoderDecoderDehaze())
        if level == "medium":
            return (med.MediumIntensityDehazeModel() if mt == "standard"
                    else med.AODNetEnhanced())
        return (high.HighIntensityDehazeModel() if mt == "complex"
                else high.DualBranchAttentionModel())
    finally:
        sys.path.remove(REF)


def _torch_outputs(model, x_nhwc):
    import numpy as np
    import torch
    from test_torch_parity import _torch_forward
    model.eval()
    y = _torch_forward(model, x_nhwc)
    return y if isinstance(y, tuple) else (y,)


def _build_selftest_pth(kind, level, config, workdir, x):
    """Reference-format .pth with random (but BN-exercising) weights, plus
    recorded torch forwards. Returns (pth_path, {name: np.ndarray})."""
    import numpy as np
    import torch
    from test_torch_parity import _randomize_bn_stats, _sd

    torch.manual_seed(5)
    recorded = {}
    pth = os.path.join(workdir, f"{kind}_selftest.pth")
    if kind == "classifier":
        m = _ref_classifier(config)
        _randomize_bn_stats(m)
        recorded["logits"] = _torch_outputs(m, x)[0]
        torch.save({"model_state_dict": {
            k: torch.from_numpy(v) for k, v in _sd(m).items()}}, pth)
    elif kind == "branch":
        m = _ref_branch(level, config)
        _randomize_bn_stats(m)
        recorded["out"] = _torch_outputs(m, x)[0]
        torch.save({"model_state_dict": {
            k: torch.from_numpy(v) for k, v in _sd(m).items()}}, pth)
    elif kind == "joint":
        ck = {"router_state_dict": {}}
        clf = _ref_classifier(config)
        _randomize_bn_stats(clf, seed=1)
        recorded["classifier_logits"] = _torch_outputs(clf, x)[0]
        ck["classifier_state_dict"] = {
            k: torch.from_numpy(v) for k, v in _sd(clf).items()}
        for i, lvl in enumerate(("low", "medium", "high")):
            b = _ref_branch(lvl, config)
            _randomize_bn_stats(b, seed=2 + i)
            recorded[f"{lvl}_out"] = _torch_outputs(b, x)[0]
            ck[f"{lvl}_model_state_dict"] = {
                k: torch.from_numpy(v) for k, v in _sd(b).items()}
        torch.save(ck, pth)
    elif kind == "fcos":
        from test_converters import _tv_fcos_state_dict
        sd = _tv_fcos_state_dict(np.random.default_rng(3))
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pth)
    return pth, recorded


def _record_real_pth(kind, level, config, pth, x):
    """Load a REAL .pth into the reference torch module and record forwards
    (fcos: no in-env torch module — returns {})."""
    if kind == "fcos":
        return {}
    import torch
    ck = torch.load(pth, map_location="cpu", weights_only=False)
    recorded = {}
    if kind == "classifier":
        m = _ref_classifier(config)
        m.load_state_dict(ck.get("model_state_dict", ck), strict=False)
        recorded["logits"] = _torch_outputs(m, x)[0]
    elif kind == "branch":
        m = _ref_branch(level, config)
        m.load_state_dict(ck.get("model_state_dict", ck), strict=False)
        recorded["out"] = _torch_outputs(m, x)[0]
    elif kind == "joint":
        clf = _ref_classifier(config)
        clf.load_state_dict(ck["classifier_state_dict"], strict=False)
        recorded["classifier_logits"] = _torch_outputs(clf, x)[0]
        for lvl in ("low", "medium", "high"):
            b = _ref_branch(lvl, config)
            b.load_state_dict(ck[f"{lvl}_model_state_dict"], strict=False)
            recorded[f"{lvl}_out"] = _torch_outputs(b, x)[0]
    return recorded


# The restore+forward+eval stage runs in a FRESH python process so it proves
# the real day-one path (no state shared with the conversion process).
_RESTORE_SCRIPT = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np
from adam_dehaze_tpu.config import load_config
from adam_dehaze_tpu.training import checkpoint as ckpt

kind = {kind!r}
level = {level!r}
conv = {conv!r}
config = load_config({config!r} or None)
config.setdefault("tpu", {{}})["compute_dtype"] = "float32"
data = np.load({npz!r})
x = jnp.asarray(data["x"])
key = jax.random.PRNGKey(0)
diffs = {{}}
out = {{}}

def restore(template):
    tree, _ = ckpt.load_checkpoint(conv, template)
    return tree

if kind == "classifier":
    from adam_dehaze_tpu.models.classifier import create_classifier
    model = create_classifier(config)
    tree = restore(model.init(key, x))
    logits, _ = model.apply(tree, x)
    diffs["logits"] = float(np.abs(np.asarray(logits) - data["logits"]).max())
elif kind == "branch":
    from adam_dehaze_tpu.models import branches
    model = {{"low": branches.create_low_intensity_model,
             "medium": branches.create_medium_intensity_model,
             "high": branches.create_high_intensity_model}}[level](config)
    tree = restore(model.init(key, x))
    y = model.apply(tree, x, train=False)
    diffs["out"] = float(np.abs(np.asarray(y) - data["out"]).max())
elif kind == "joint":
    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.models.routing import create_router
    clf = create_classifier(config)
    branch_models = create_branch_models(config)
    router = create_router(branch_models, clf, config)
    tree = restore(router.init({{"params": key, "dropout": key}}, x))
    p, s = tree["params"], tree["batch_stats"]
    logits, _ = clf.apply({{"params": p["classifier"],
                           "batch_stats": s["classifier"]}}, x)
    if "classifier_logits" in data:
        diffs["classifier_logits"] = float(
            np.abs(np.asarray(logits) - data["classifier_logits"]).max())
    for lvl in ("low", "medium", "high"):
        m = branch_models[lvl]
        y = m.apply({{"params": p[f"models_{{lvl}}"],
                     "batch_stats": s[f"models_{{lvl}}"]}}, x, train=False)
        if f"{{lvl}}_out" in data:
            diffs[f"{{lvl}}_out"] = float(
                np.abs(np.asarray(y) - data[f"{{lvl}}_out"]).max())
    # tiny adaptive eval: synthetic fog triplets through the full router
    from adam_dehaze_tpu.data.synthetic import apply_random_fog
    from adam_dehaze_tpu.ops.image import psnr
    kc, kf = jax.random.split(key)
    clear = jax.random.uniform(kc, (6,) + x.shape[1:])
    inten = jnp.asarray([0, 1, 2, 0, 1, 2])
    hazy = apply_random_fog(kf, clear, inten)
    dehazed, info = router.apply(tree, hazy, train=False)
    out["eval_psnr_dehazed"] = float(jnp.mean(psnr(dehazed, clear)))
    out["eval_psnr_hazy"] = float(jnp.mean(psnr(hazy, clear)))
elif kind == "fcos":
    from adam_dehaze_tpu.models.detection import FCOSDetector
    module = FCOSDetector(num_classes=91,
                          backbone_name="tv_fcos_resnet50_fpn",
                          channels=256, torchvision_compat=True)
    xf = jnp.zeros((1, 128, 128, 3), jnp.float32)
    tree = restore(module.init(key, xf))
    levels = module.apply(tree, xf)
    finite = all(bool(jnp.isfinite(t).all())
                 for lv in levels
                 for t in (lv["logits"], lv["offsets"], lv["centerness"]))
    out["n_levels"] = len(levels)
    out["finite"] = finite
    if not finite:
        out["error"] = "non-finite detector outputs"

out["diffs"] = diffs
print("RESTORE_RESULT " + json.dumps(out))
"""


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", required=True,
                   choices=["classifier", "branch", "joint", "fcos"])
    p.add_argument("--level", default="medium",
                   choices=["low", "medium", "high"])
    p.add_argument("--pth", default=None, help="Real reference .pth")
    p.add_argument("--selftest", action="store_true",
                   help="Build a reference-format .pth from the actual "
                        "reference torch modules (random weights)")
    p.add_argument("--config", default=None)
    p.add_argument("--workdir", default=None)
    p.add_argument("--atol", type=float, default=1e-4)
    args = p.parse_args(argv)
    if not args.pth and not args.selftest:
        p.error("need --pth (real weights) or --selftest")

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from adam_dehaze_tpu.config import load_config
    config = load_config(args.config)

    workdir = args.workdir or tempfile.mkdtemp(prefix="validate_weights_")
    os.makedirs(workdir, exist_ok=True)
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    if args.selftest:
        pth, recorded = _build_selftest_pth(args.kind, args.level, config,
                                            workdir, x)
    else:
        pth = args.pth
        recorded = _record_real_pth(args.kind, args.level, config, pth, x)

    conv = os.path.join(workdir, f"{args.kind}_converted")
    cmd = [sys.executable, os.path.join(REPO, "tools",
                                        "convert_reference_checkpoint.py"),
           "--kind", args.kind, "--pth", pth, "--out", conv]
    if args.kind == "branch":
        cmd += ["--level", args.level]
    if args.config:
        cmd += ["--config", args.config]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        print(json.dumps({"kind": args.kind, "ok": False,
                          "stage": "convert", "stderr": r.stderr[-800:]}))
        return 1

    npz = os.path.join(workdir, "recorded.npz")
    np.savez(npz, x=x, **recorded)
    script = _RESTORE_SCRIPT.format(repo=REPO, kind=args.kind,
                                    level=args.level, conv=conv,
                                    config=args.config or "", npz=npz)
    r2 = subprocess.run([sys.executable, "-c", script],
                        capture_output=True, text=True)
    line = next((ln for ln in r2.stdout.splitlines()
                 if ln.startswith("RESTORE_RESULT ")), None)
    if r2.returncode != 0 or line is None:
        print(json.dumps({"kind": args.kind, "ok": False,
                          "stage": "restore",
                          "stderr": (r2.stderr or r2.stdout)[-800:]}))
        return 1
    res = json.loads(line[len("RESTORE_RESULT "):])
    diffs = res.pop("diffs", {})
    ok = all(d <= args.atol for d in diffs.values())
    if args.kind == "fcos":
        ok = bool(res.get("finite", False))
    summary = {"kind": args.kind, "pth": pth, "converted": conv, "ok": ok,
               "mode": "selftest" if args.selftest else "real",
               "parity": ("layout_only" if args.kind == "fcos"
                          else "forward_numeric"),
               "atol": args.atol, "forward_max_abs_diff": diffs, **res}
    print(json.dumps(summary))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
