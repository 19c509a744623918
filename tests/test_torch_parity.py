"""Numerical forward parity against the ACTUAL torch reference.

Imports the reference branch modules from /root/reference (they depend only on
torch, which is installed CPU-only), builds each of the six branch variants
with random weights, converts the state dict with
training/checkpoint.py:load_torch_branch, and asserts eval-mode forward
agreement. This is what makes BASELINE.md's "PSNR within 0.05 dB" a checkable
claim (reference: models/dehazing/low_intensity.py:5-140,
medium_intensity.py:5-215, high_intensity.py:6-239).

The classifier test imports the actual reference models/classifier.py through
a torchvision/timm shim (neither package is installed); the shim's resnet18
replicates torchvision's architecture and state-dict naming exactly, so the
converted keys are the ones a real torchvision checkpoint would have
(reference: models/classifier.py:22-78).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

ATOL = 1e-4


# ---------------------------------------------------------------------------
# Reference import helpers
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref():
    """Import the actual reference dehazing modules."""
    sys.path.insert(0, REF)
    try:
        import models.dehazing.low_intensity as low
        import models.dehazing.medium_intensity as med
        import models.dehazing.high_intensity as high
        yield {"low": low, "med": med, "high": high}
    finally:
        sys.path.remove(REF)


def _randomize_bn_stats(model, seed=0):
    """Give BatchNorm running stats non-default values so the conversion of
    mean/var is actually exercised (fresh torch BNs are mean 0 / var 1)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) * 0.5 + 0.5)


def _sd(model):
    # .copy(): torch .numpy() returns views of live buffers; without it the
    # in-place BN running-stat updates of a later train-mode torch forward
    # would alias into the converted flax trees.
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()
            if "num_batches_tracked" not in k}


def _torch_forward(model, x_nhwc):
    xt = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        y = model(xt)
    if isinstance(y, tuple):
        return tuple(np.asarray(t) for t in y)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def _flax_forward(module, sd, kind, x_nhwc, key):
    from adam_dehaze_tpu.training.checkpoint import load_torch_branch
    variables = module.init(key, jnp.asarray(x_nhwc))
    params, stats = load_torch_branch(sd, kind, variables["params"],
                                      variables["batch_stats"])
    y = module.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x_nhwc))
    return np.asarray(y)


# ---------------------------------------------------------------------------
# The six branch variants (reference factories: low_intensity.py:127-140,
# medium_intensity.py:201-215, high_intensity.py:225-239)
# ---------------------------------------------------------------------------

def _branch_cases():
    from adam_dehaze_tpu.models import branches as B
    return {
        "lightweight": (lambda ref: ref["low"].LightweightDehazeModel(
            base_channels=32, n_blocks=3),
            B.LightweightDehazeModel(base_channels=32, n_blocks=3)),
        "low_unet": (lambda ref: ref["low"].LowIntensityDehazeModel(
            base_channels=32, n_blocks=3),
            B.LowIntensityUNet(base_channels=32, n_blocks=3)),
        "medium": (lambda ref: ref["med"].MediumIntensityDehazeModel(
            base_channels=32, n_blocks=6),
            B.MediumIntensityDehazeModel(base_channels=32, n_blocks=6)),
        "corun": (lambda ref: ref["med"].COrunInspiredModel(
            base_channels=32, n_blocks=6),
            B.COrunInspiredModel(base_channels=32, n_blocks=6)),
        "high": (lambda ref: ref["high"].HighIntensityDehazeModel(
            base_channels=32, n_blocks=9),
            B.HighIntensityDehazeModel(base_channels=32, n_blocks=9)),
        "dual_branch": (lambda ref: ref["high"].DualBranchAttentionModel(
            base_channels=32, n_blocks=9),
            B.DualBranchAttentionModel(base_channels=32, n_blocks=9)),
    }


@pytest.mark.parametrize("kind", ["lightweight", "low_unet", "medium",
                                  "corun", "high", "dual_branch"])
def test_branch_forward_parity(ref, kind, key, rng):
    make_torch, flax_mod = _branch_cases()[kind]
    torch.manual_seed(hash(kind) % (2 ** 31))
    tmodel = make_torch(ref)
    _randomize_bn_stats(tmodel)
    tmodel.eval()

    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    y_t = _torch_forward(tmodel, x)
    y_f = _flax_forward(flax_mod, _sd(tmodel), kind, x, key)

    assert y_f.shape == y_t.shape
    np.testing.assert_allclose(y_f, y_t, atol=ATOL, rtol=0)


def test_branch_param_count_parity(ref):
    """Converted trees cover every torch parameter (no silent drops)."""
    from adam_dehaze_tpu.training.checkpoint import load_torch_branch
    for kind, (make_torch, flax_mod) in _branch_cases().items():
        tmodel = make_torch(ref)
        sd = _sd(tmodel)
        variables = flax_mod.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 32, 32, 3)))
        n_torch = sum(v.size for v in sd.values())
        params, stats = load_torch_branch(sd, kind, variables["params"],
                                          variables["batch_stats"])
        n_flax = sum(np.asarray(l).size
                     for l in jax.tree_util.tree_leaves((params, stats)))
        assert n_torch == n_flax, f"{kind}: {n_torch} torch vs {n_flax} flax"


def test_branch_train_mode_bn_step(ref, key, rng):
    """One train-mode step: outputs match and BN running-stat updates agree.

    Documented divergence: torch updates running_var with the UNBIASED batch
    variance (n/(n-1) correction) while flax uses the biased one; both
    normalize activations with the biased variance, so train outputs match
    exactly and the var updates agree after the analytic correction.
    """
    make_torch, flax_mod = _branch_cases()["lightweight"]
    torch.manual_seed(7)
    tmodel = make_torch(ref)
    _randomize_bn_stats(tmodel, seed=3)
    from adam_dehaze_tpu.training.checkpoint import load_torch_branch
    x = rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32)
    variables = flax_mod.init(key, jnp.asarray(x))
    params, stats = load_torch_branch(_sd(tmodel), "lightweight",
                                      variables["params"],
                                      variables["batch_stats"])
    old_var = np.asarray(stats["ConvBlock_0"]["BatchNorm_0"]["var"])
    old_mean = np.asarray(stats["ConvBlock_0"]["BatchNorm_0"]["mean"])

    tmodel.train()
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        y_t = np.transpose(tmodel(xt).numpy(), (0, 2, 3, 1))
    t_bn = tmodel.init_conv.block[1]
    t_new_mean = t_bn.running_mean.numpy()
    t_new_var = t_bn.running_var.numpy()

    y_f, mutated = flax_mod.apply({"params": params, "batch_stats": stats},
                                  jnp.asarray(x), train=True,
                                  mutable=["batch_stats"])
    f_new = mutated["batch_stats"]["ConvBlock_0"]["BatchNorm_0"]
    np.testing.assert_allclose(np.asarray(y_f), y_t, atol=ATOL, rtol=0)
    np.testing.assert_allclose(np.asarray(f_new["mean"]), t_new_mean,
                               atol=1e-5, rtol=0)
    n = x.shape[0] * x.shape[1] * x.shape[2]  # reduction count per channel
    flax_update = np.asarray(f_new["var"]) - 0.9 * old_var
    torch_update = t_new_var - 0.9 * old_var
    np.testing.assert_allclose(torch_update, flax_update * n / (n - 1),
                               atol=1e-5, rtol=0)
    assert not np.allclose(old_mean, t_new_mean)  # the step moved the stats


# ---------------------------------------------------------------------------
# Classifier (backbone + head) via the actual reference models/classifier.py
# ---------------------------------------------------------------------------

class _TVBasicBlock(torch.nn.Module):
    """torchvision BasicBlock replica (exact key names) — test fixture so the
    reference classifier can be imported without torchvision installed."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.relu = torch.nn.ReLU(inplace=True)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class _TVResNet18(torch.nn.Module):
    """torchvision resnet18 replica (key names: conv1, bn1, layerN.M.*, fc)."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU(inplace=True)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        cin = 64
        for li, w in enumerate(widths, start=1):
            blocks = [_TVBasicBlock(cin, w, stride=1 if li == 1 else 2),
                      _TVBasicBlock(w, w)]
            setattr(self, f"layer{li}", torch.nn.Sequential(*blocks))
            cin = w
        self.avgpool = torch.nn.AdaptiveAvgPool2d((1, 1))
        self.fc = torch.nn.Linear(512, 1000)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


class _TVConvBNAct(torch.nn.Sequential):
    """torchvision ConvBNActivation replica (keys .0 conv / .1 bn)."""

    def __init__(self, cin, cout, k=3, stride=1, groups=1):
        super().__init__(
            torch.nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups,
                            bias=False),
            torch.nn.BatchNorm2d(cout),
            torch.nn.ReLU6(inplace=True))


class _TVInvertedResidual(torch.nn.Module):
    """torchvision mobilenet_v2 InvertedResidual replica (keys conv.N.*)."""

    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = cin * expand
        self.use_res = stride == 1 and cin == cout
        layers = []
        if expand != 1:
            layers.append(_TVConvBNAct(cin, hidden, k=1))
        layers += [_TVConvBNAct(hidden, hidden, 3, stride, groups=hidden),
                   torch.nn.Conv2d(hidden, cout, 1, bias=False),
                   torch.nn.BatchNorm2d(cout)]
        self.conv = torch.nn.Sequential(*layers)

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.use_res else y


class _TVMobileNetV2(torch.nn.Module):
    """torchvision mobilenet_v2 replica (keys features.N..., classifier)."""

    def __init__(self):
        super().__init__()
        cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
               (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        feats = [_TVConvBNAct(3, 32, 3, 2)]
        cin = 32
        for t, c, n, s in cfg:
            for i in range(n):
                feats.append(_TVInvertedResidual(cin, c, s if i == 0 else 1, t))
                cin = c
        feats.append(_TVConvBNAct(cin, 1280, k=1))
        self.features = torch.nn.Sequential(*feats)
        self.classifier = torch.nn.Linear(1280, 1000)

    def forward(self, x):
        x = self.features(x)
        x = torch.nn.functional.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
        return self.classifier(x)


class _TimmSE(torch.nn.Module):
    """timm SqueezeExcite replica (keys conv_reduce / conv_expand); squeeze
    width from the BLOCK input channels (timm se_ratio semantics)."""

    def __init__(self, ch, block_in):
        super().__init__()
        rd = max(1, int(block_in * 0.25))
        self.conv_reduce = torch.nn.Conv2d(ch, rd, 1)
        self.conv_expand = torch.nn.Conv2d(rd, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.nn.functional.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class _TimmDsConv(torch.nn.Module):
    """timm DepthwiseSeparableConv replica (efficientnet stage 0).
    BN eps pinned to our flax module's 1e-3 (nn/efficientnet.py)."""

    def __init__(self, cin, cout, stride, k):
        super().__init__()
        self.conv_dw = torch.nn.Conv2d(cin, cin, k, stride, k // 2,
                                       groups=cin, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cin, eps=1e-3)
        self.se = _TimmSE(cin, cin)
        self.conv_pw = torch.nn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout, eps=1e-3)
        self.use_res = stride == 1 and cin == cout

    def forward(self, x):
        y = torch.nn.functional.silu(self.bn1(self.conv_dw(x)))
        y = self.bn2(self.conv_pw(self.se(y)))
        return x + y if self.use_res else y


class _TimmIR(torch.nn.Module):
    """timm InvertedResidual replica (efficientnet stages 1+)."""

    def __init__(self, cin, cout, stride, k, expand):
        super().__init__()
        hidden = cin * expand
        self.conv_pw = torch.nn.Conv2d(cin, hidden, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(hidden, eps=1e-3)
        self.conv_dw = torch.nn.Conv2d(hidden, hidden, k, stride, k // 2,
                                       groups=hidden, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(hidden, eps=1e-3)
        self.se = _TimmSE(hidden, cin)
        self.conv_pwl = torch.nn.Conv2d(hidden, cout, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(cout, eps=1e-3)
        self.use_res = stride == 1 and cin == cout

    def forward(self, x):
        y = torch.nn.functional.silu(self.bn1(self.conv_pw(x)))
        y = torch.nn.functional.silu(self.bn2(self.conv_dw(y)))
        y = self.bn3(self.conv_pwl(self.se(y)))
        return x + y if self.use_res else y


class _TimmEffB0(torch.nn.Module):
    """timm efficientnet_b0 replica (keys conv_stem/bn1/blocks.S.I.*/
    conv_head/bn2/classifier)."""

    def __init__(self):
        super().__init__()
        cfg = [(1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
               (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
               (6, 320, 1, 1, 3)]
        self.conv_stem = torch.nn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(32, eps=1e-3)
        stages = []
        cin = 32
        for expand, c, n, s, k in cfg:
            blocks = []
            for i in range(n):
                stride = s if i == 0 else 1
                if expand == 1:
                    blocks.append(_TimmDsConv(cin, c, stride, k))
                else:
                    blocks.append(_TimmIR(cin, c, stride, k, expand))
                cin = c
            stages.append(torch.nn.Sequential(*blocks))
        self.blocks = torch.nn.Sequential(*stages)
        self.conv_head = torch.nn.Conv2d(cin, 1280, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(1280, eps=1e-3)
        self.classifier = torch.nn.Linear(1280, 1000)

    def forward(self, x):
        x = torch.nn.functional.silu(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        x = torch.nn.functional.silu(self.bn2(self.conv_head(x)))
        x = torch.nn.functional.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
        return self.classifier(x)


@pytest.fixture(scope="module")
def ref_classifier_module():
    """Import the actual reference models/classifier.py with torchvision/timm
    shimmed (the backbone factory is replaced by the exact-naming replica)."""
    import types
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.resnet18 = lambda pretrained=False: _TVResNet18()
    tvm.mobilenet_v2 = lambda pretrained=False: _TVMobileNetV2()
    tv.models = tvm
    timm = types.ModuleType("timm")
    timm.create_model = lambda name, pretrained=False: _TimmEffB0()
    saved = {k: sys.modules.get(k) for k in ("torchvision",
                                             "torchvision.models", "timm")}
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    sys.modules["timm"] = timm
    sys.path.insert(0, REF)
    try:
        import models.classifier as ref_clf
        yield ref_clf
    finally:
        sys.path.remove(REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_classifier_forward_parity(ref_classifier_module, key, rng):
    from adam_dehaze_tpu.models.classifier import FogIntensityClassifier
    from adam_dehaze_tpu.training.checkpoint import load_torch_classifier

    torch.manual_seed(11)
    tclf = ref_classifier_module.FogIntensityClassifier(
        model_name="resnet18", num_classes=3, pretrained=False)
    _randomize_bn_stats(tclf)
    tclf.eval()

    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    logits_t, feats_t = _torch_forward(tclf, x)

    fclf = FogIntensityClassifier(model_name="resnet18")
    variables = fclf.init(key, jnp.asarray(x))
    params, stats = load_torch_classifier(_sd(tclf), variables["params"],
                                          variables["batch_stats"], "resnet18")
    logits_f, feats_f = fclf.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(feats_f), feats_t, atol=ATOL, rtol=0)
    np.testing.assert_allclose(np.asarray(logits_f), logits_t, atol=ATOL,
                               rtol=0)


@pytest.mark.parametrize("backbone", ["mobilenet_v2", "efficientnet_b0"])
def test_classifier_forward_parity_nonresnet(ref_classifier_module, backbone,
                                             key, rng):
    """Round-2 verdict item #7: classifier conversion past resnets — the
    reference supports torchvision mobilenet_v2/v3 and timm efficientnet
    (reference classifier.py:38-66); converted checkpoints must forward-match
    through the same exact-key-replica harness as the resnet path."""
    from adam_dehaze_tpu.models.classifier import FogIntensityClassifier
    from adam_dehaze_tpu.training.checkpoint import load_torch_classifier

    torch.manual_seed(13)
    tclf = ref_classifier_module.FogIntensityClassifier(
        model_name=backbone, num_classes=3, pretrained=False)
    _randomize_bn_stats(tclf)
    tclf.eval()

    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    logits_t, feats_t = _torch_forward(tclf, x)

    fclf = FogIntensityClassifier(model_name=backbone)
    variables = fclf.init(key, jnp.asarray(x))
    params, stats = load_torch_classifier(_sd(tclf), variables["params"],
                                          variables["batch_stats"], backbone)
    logits_f, feats_f = fclf.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(feats_f), feats_t, atol=ATOL, rtol=0)
    np.testing.assert_allclose(np.asarray(logits_f), logits_t, atol=ATOL,
                               rtol=0)


# ---------------------------------------------------------------------------
# Joint 5-state checkpoint -> full router parity
# (reference train_joint.py:272-283)
# ---------------------------------------------------------------------------

def _small_config(routing_type):
    return {
        "classifier": {"model": "resnet18", "num_classes": 3,
                       "pretrained": False},
        "dehazing": {
            "low": {"model_type": "lightweight", "channels": 16, "blocks": 2},
            "medium": {"model_type": "standard", "channels": 16, "blocks": 6},
            "high": {"model_type": "complex", "channels": 16, "blocks": 9},
        },
        "routing": {"type": routing_type, "temperature": 0.5},
        "device": "cpu",
    }


@pytest.mark.slow
@pytest.mark.parametrize("routing_type", ["soft", "gated"])
def test_joint_checkpoint_router_parity(ref, ref_classifier_module, key, rng,
                                        routing_type):
    """Build the reference joint system (classifier + 3 branches + router),
    save its 5-state checkpoint dict, convert with load_torch_joint, and
    assert the full routed forward matches."""
    sys.path.insert(0, REF)
    try:
        import models.routing as ref_routing
    finally:
        sys.path.remove(REF)

    cfg = _small_config(routing_type)
    torch.manual_seed(23)
    tclf = ref_classifier_module.FogIntensityClassifier(
        "resnet18", 3, pretrained=False)
    tmodels = {
        "low": ref["low"].create_low_intensity_model(cfg),
        "medium": ref["med"].create_medium_intensity_model(cfg),
        "high": ref["high"].create_high_intensity_model(cfg),
    }
    trouter = ref_routing.create_router(tmodels, tclf, cfg)
    for m in [tclf, *tmodels.values(), trouter]:
        _randomize_bn_stats(m)
        m.eval()

    ckpt = {
        "router_state_dict": _sd(trouter),
        "low_model_state_dict": _sd(tmodels["low"]),
        "medium_model_state_dict": _sd(tmodels["medium"]),
        "high_model_state_dict": _sd(tmodels["high"]),
        "classifier_state_dict": _sd(tclf),
    }

    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        y_t, _ = trouter(xt)
    y_t = np.transpose(y_t.numpy(), (0, 2, 3, 1))

    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.models.routing import create_router
    from adam_dehaze_tpu.training.checkpoint import load_torch_joint

    fmodels = create_branch_models(cfg)
    fclf = create_classifier(cfg)
    frouter = create_router(fmodels, fclf, cfg)
    variables = frouter.init(key, jnp.asarray(x))
    tree = load_torch_joint(ckpt, variables, cfg)
    y_f, info = frouter.apply(tree, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_f), y_t, atol=ATOL, rtol=0)


def test_branch_converter_cli_roundtrip(ref, key, rng, tmp_path):
    """End-to-end migration of a reference branch .pth through the CLI:
    torch.save -> convert_reference_checkpoint --kind branch -> orbax restore
    -> forward matches torch."""
    sys.path.insert(0, "/root/repo")
    from tools.convert_reference_checkpoint import main as convert_main

    from adam_dehaze_tpu.config import load_config
    from adam_dehaze_tpu.models.branches import create_low_intensity_model
    from adam_dehaze_tpu.training import checkpoint as ckpt_mod

    torch.manual_seed(5)
    cfg = load_config()
    cfg["dehazing"]["low"] = {"model_type": "lightweight", "channels": 16,
                              "blocks": 2, "learning_rate": 1e-4}
    cfg["tpu"]["compute_dtype"] = "float32"  # bf16 would swamp the 1e-4 tol
    tmodel = ref["low"].create_low_intensity_model(cfg)
    _randomize_bn_stats(tmodel)
    tmodel.eval()
    pth = str(tmp_path / "low_best.pth")
    torch.save({"epoch": 3, "model_state_dict": tmodel.state_dict()}, pth)

    cfg_yaml = str(tmp_path / "cfg.yaml")
    import yaml
    with open(cfg_yaml, "w") as f:
        yaml.dump({"dehazing": {"low": cfg["dehazing"]["low"]}}, f)
    out = str(tmp_path / "low_converted")
    convert_main(["--kind", "branch", "--level", "low", "--pth", pth,
                  "--out", out, "--config", cfg_yaml, "--image_size", "16"])

    model = create_low_intensity_model(cfg)
    template = model.init(key, jnp.zeros((1, 16, 16, 3)))
    tree, _ = ckpt_mod.load_checkpoint(out, dict(template))
    x = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    y_t = _torch_forward(tmodel, x)
    y_f = model.apply(tree, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_f), y_t, atol=ATOL, rtol=0)
