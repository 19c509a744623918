"""Torch-weight converter tests using synthetic state_dicts with torchvision
naming (torchvision itself is unavailable; shapes follow its conventions)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.losses.lpips import LPIPS
from adam_dehaze_tpu.nn.resnet import resnet18
from adam_dehaze_tpu.nn.vgg import VGG16Features
from adam_dehaze_tpu.training.checkpoint import (
    load_torch_lpips,
    load_torch_resnet,
    load_torch_vgg16,
)


def _fake_resnet18_sd(rng):
    """State dict with torchvision resnet18 key names and shapes."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.running_var"] = np.abs(rng.standard_normal(c)).astype(np.float32) + 1

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_ch = 64
    for li, w in enumerate(widths, start=1):
        for b in range(2):
            p = f"layer{li}.{b}"
            conv(f"{p}.conv1", w, in_ch if b == 0 else w, 3)
            bn(f"{p}.bn1", w)
            conv(f"{p}.conv2", w, w, 3)
            bn(f"{p}.bn2", w)
            if b == 0 and (li > 1):
                conv(f"{p}.downsample.0", w, in_ch, 1)
                bn(f"{p}.downsample.1", w)
        in_ch = w
    return sd


def test_resnet18_conversion_roundtrip(key, rng):
    model = resnet18()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(key, x)
    sd = _fake_resnet18_sd(rng)
    params, stats = load_torch_resnet(sd, vars_["params"], vars_["batch_stats"])
    # Every converted leaf matches its source tensor.
    np.testing.assert_allclose(
        params["Conv_0"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(params["BasicBlock_2"]["Conv_2"]["kernel"],
                               np.transpose(sd["layer2.0.downsample.0.weight"],
                                            (2, 3, 1, 0)))
    np.testing.assert_allclose(stats["BasicBlock_7"]["BatchNorm_1"]["var"],
                               sd["layer4.1.bn2.running_var"])
    # Forward still runs with converted weights.
    out = model.apply({"params": params, "batch_stats": stats}, x)
    assert out.shape == (1, 512)


def test_resnet18_conversion_shape_guard(key, rng):
    model = resnet18()
    vars_ = model.init(key, jnp.zeros((1, 32, 32, 3)))
    sd = _fake_resnet18_sd(rng)
    sd["conv1.weight"] = sd["conv1.weight"][:, :, :3, :3]  # corrupt
    with pytest.raises(ValueError, match="Shape mismatch"):
        load_torch_resnet(sd, vars_["params"], vars_["batch_stats"])


def test_vgg16_conversion(key, rng):
    net = VGG16Features(taps=("relu2_2", "relu3_3", "relu4_3"))
    vars_ = net.init(key, jnp.zeros((1, 32, 32, 3)))
    sd = {}
    widths = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
              (256, 256), (256, 256), (512, 256), (512, 512), (512, 512),
              (512, 512), (512, 512), (512, 512)]
    for idx, (o, i) in zip((0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28),
                           widths):
        sd[f"features.{idx}.weight"] = rng.standard_normal(
            (o, i, 3, 3)).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.standard_normal(o).astype(np.float32)
    params = load_torch_vgg16(sd, vars_)
    np.testing.assert_allclose(
        params["params"]["conv1_1"]["kernel"],
        np.transpose(sd["features.0.weight"], (2, 3, 1, 0)))
    out = net.apply(params, jnp.zeros((1, 32, 32, 3)))
    assert "relu4_3" in out


def test_alexnet_trunk_conversion(key, rng):
    from adam_dehaze_tpu.training.checkpoint import load_torch_alexnet

    m = LPIPS()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(key, x, x)
    shapes = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3),
              (256, 256, 3)]
    sd = {}
    for idx, (o, i, k) in zip((0, 3, 6, 8, 10), shapes):
        sd[f"features.{idx}.weight"] = rng.standard_normal(
            (o, i, k, k)).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.standard_normal(o).astype(np.float32)
    params = load_torch_alexnet(sd, vars_)
    trunk = [k for k in params["params"] if k.startswith("AlexNetFeatures")][0]
    np.testing.assert_allclose(
        params["params"][trunk]["conv1"]["kernel"],
        np.transpose(sd["features.0.weight"], (2, 3, 1, 0)))
    d = m.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d), [0.0], atol=1e-6)


def test_converter_cli_roundtrip(key, rng, tmp_path):
    """The migration CLI converts a (synthetic) reference .pth into an orbax
    checkpoint that restores and runs."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.convert_reference_checkpoint import main as convert_main

    from adam_dehaze_tpu.training import checkpoint as ckpt

    sd = {k: torch.from_numpy(v) for k, v in _fake_resnet18_sd(rng).items()}
    pth = str(tmp_path / "ref.pth")
    torch.save({"model_state_dict": sd}, pth)
    out = str(tmp_path / "converted")
    convert_main(["--kind", "resnet18", "--pth", pth, "--out", out,
                  "--image_size", "32"])

    model = resnet18()
    template = model.init(key, jnp.zeros((1, 32, 32, 3)))
    tree, _ = ckpt.load_checkpoint(out, {"params": template["params"],
                                         "batch_stats": template["batch_stats"]})
    y = model.apply(tree, jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 512)
    np.testing.assert_allclose(
        np.asarray(tree["params"]["Conv_0"]["kernel"]),
        np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)))


def test_model_info(key):
    from adam_dehaze_tpu.models.branches import LightweightDehazeModel
    from adam_dehaze_tpu.utils import model_info

    m = LightweightDehazeModel(base_channels=4, n_blocks=1)
    v = m.init(key, jnp.zeros((1, 8, 8, 3)))
    info = model_info(m, v)
    assert info["model_type"] == "LightweightDehazeModel"
    assert info["params"] == info["trainable_params"] > 0
    assert info["base_channels"] == 4


def test_lpips_head_conversion(key, rng):
    m = LPIPS()
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = m.init(key, x, x)
    chans = [64, 192, 384, 256, 256]
    sd = {f"lin{i}.model.1.weight":
          np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32)
          for i, c in enumerate(chans)}
    params = load_torch_lpips(sd, vars_)
    np.testing.assert_allclose(params["params"]["lin0"],
                               sd["lin0.model.1.weight"].reshape(-1))
    d = m.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d), [0.0], atol=1e-6)


def test_load_checkpoint_cross_device_fallback(tmp_path, monkeypatch):
    """A checkpoint whose sharding metadata references an unavailable device
    (e.g. saved on TPU, restored on CPU) falls back to a host-numpy PyTree
    restore instead of failing (checkpoint.py:load_checkpoint)."""
    import numpy as np
    import orbax.checkpoint as ocp

    from adam_dehaze_tpu.training import checkpoint as ckpt

    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.int32(7)}
    path = ckpt.save_checkpoint(str(tmp_path), "best_model", state,
                                {"val": 1.0})

    class _FailingStd:
        def restore(self, *a, **k):
            raise ValueError(
                "Device TPU v5 lite0 was not found in jax.local_devices().")

    monkeypatch.setattr(ckpt, "_checkpointer", lambda: _FailingStd())
    restored, metrics = ckpt.load_checkpoint(path)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state["params"]["w"])
    assert int(restored["step"]) == 7
    assert metrics["val"] == 1.0

    # Targeted fallback restore validates against the target tree: missing,
    # extra, and shape-mismatched leaves all fail with a legible error
    # instead of an opaque tree_map structure crash.
    ok, _ = ckpt.load_checkpoint(
        path, {"params": {"w": np.zeros((2, 3), np.float32)},
               "step": np.int32(0)})
    np.testing.assert_array_equal(ok["params"]["w"], state["params"]["w"])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="missing keys"):
        ckpt.load_checkpoint(
            path, {"params": {"w": np.zeros((2, 3), np.float32),
                              "b": np.zeros(3, np.float32)},
                   "step": np.int32(0)})
    with _pytest.raises(ValueError, match="extra keys"):
        ckpt.load_checkpoint(path, {"step": np.int32(0)})
    with _pytest.raises(ValueError, match="shape"):
        ckpt.load_checkpoint(
            path, {"params": {"w": np.zeros((3, 2), np.float32)},
                   "step": np.int32(0)})


def _tv_fcos_state_dict(rng, nested: bool = True):
    """Synthetic state dict with torchvision fcos_resnet50_fpn's exact key
    layout and shapes (random values — the real .pth is egress-blocked; the
    converter is layout-tested the same way the other pretrained surfaces
    are)."""
    sd = {}

    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.05

    def add_bn(prefix, c):
        add(f"{prefix}.weight", c)
        add(f"{prefix}.bias", c)
        add(f"{prefix}.running_mean", c)
        sd[f"{prefix}.running_var"] = np.abs(
            rng.standard_normal((c,)).astype(np.float32)) + 1.0

    add("backbone.body.conv1.weight", 64, 3, 7, 7)
    add_bn("backbone.body.bn1", 64)
    stage_sizes = (3, 4, 6, 3)
    cin = 64
    for li, n_blocks in enumerate(stage_sizes, start=1):
        mid = 64 * 2 ** (li - 1)
        out = mid * 4
        for b in range(n_blocks):
            tp = f"backbone.body.layer{li}.{b}"
            add(f"{tp}.conv1.weight", mid, cin, 1, 1)
            add_bn(f"{tp}.bn1", mid)
            add(f"{tp}.conv2.weight", mid, mid, 3, 3)
            add_bn(f"{tp}.bn2", mid)
            add(f"{tp}.conv3.weight", out, mid, 1, 1)
            add_bn(f"{tp}.bn3", out)
            if b == 0:
                add(f"{tp}.downsample.0.weight", out, cin, 1, 1)
                add_bn(f"{tp}.downsample.1", out)
            cin = out

    for i, c in enumerate((512, 1024, 2048)):
        ib = f"backbone.fpn.inner_blocks.{i}" + (".0" if nested else "")
        add(f"{ib}.weight", 256, c, 1, 1)
        add(f"{ib}.bias", 256)
        lb = f"backbone.fpn.layer_blocks.{i}" + (".0" if nested else "")
        add(f"{lb}.weight", 256, 256, 3, 3)
        add(f"{lb}.bias", 256)
    for lvl in ("p6", "p7"):
        add(f"backbone.fpn.extra_blocks.{lvl}.weight", 256, 256, 3, 3)
        add(f"backbone.fpn.extra_blocks.{lvl}.bias", 256)

    for headname in ("classification_head", "regression_head"):
        for i in range(4):
            cw = (f"head.{headname}.conv.{i}.0" if nested
                  else f"head.{headname}.conv.{3 * i}")
            gn = (f"head.{headname}.conv.{i}.1" if nested
                  else f"head.{headname}.conv.{3 * i + 1}")
            add(f"{cw}.weight", 256, 256, 3, 3)
            add(f"{cw}.bias", 256)
            add(f"{gn}.weight", 256)
            add(f"{gn}.bias", 256)
    add("head.classification_head.cls_logits.weight", 91, 256, 3, 3)
    add("head.classification_head.cls_logits.bias", 91)
    add("head.regression_head.bbox_reg.weight", 4, 256, 3, 3)
    add("head.regression_head.bbox_reg.bias", 4)
    add("head.regression_head.bbox_ctrness.weight", 1, 256, 3, 3)
    add("head.regression_head.bbox_ctrness.bias", 1)
    return sd


@pytest.mark.slow
@pytest.mark.parametrize("nested", [True, False])
def test_load_torch_fcos_layout(nested):
    """tv-compat FCOSDetector accepts a torchvision-layout state dict in both
    historical Sequential key forms; forward over the converted tree yields
    5 pyramid levels with finite outputs."""
    import jax
    import jax.numpy as jnp
    from adam_dehaze_tpu.models.detection import FCOSDetector
    from adam_dehaze_tpu.training.checkpoint import (convert_torch_conv,
                                                     load_torch_fcos)

    rng = np.random.default_rng(0 if nested else 1)
    sd = _tv_fcos_state_dict(rng, nested=nested)
    module = FCOSDetector(num_classes=91,
                          backbone_name="tv_fcos_resnet50_fpn",
                          channels=256, torchvision_compat=True)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    tree = load_torch_fcos(sd, variables)

    # Spot-check weight routing (cls tower conv 2 and the P6 conv).
    cw_key = ("head.classification_head.conv.2.0.weight" if nested
              else "head.classification_head.conv.6.weight")
    np.testing.assert_array_equal(
        tree["params"]["FCOSHead_0"]["cls2"]["kernel"],
        convert_torch_conv(sd[cw_key]))
    np.testing.assert_array_equal(
        tree["params"]["FPN_0"]["p6"]["kernel"],
        convert_torch_conv(sd["backbone.fpn.extra_blocks.p6.weight"]))
    np.testing.assert_array_equal(
        tree["batch_stats"]["ResNet_0"]["BatchNorm_0"]["mean"],
        sd["backbone.body.bn1.running_mean"])

    outs = module.apply(tree, x)
    assert [o["stride"] for o in outs] == [8, 16, 32, 64, 128]
    for o in outs:
        assert o["logits"].shape[-1] == 91
        assert o["offsets"].shape[-1] == 4
        assert np.isfinite(np.asarray(o["logits"])).all()
