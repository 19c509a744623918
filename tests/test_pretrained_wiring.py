"""Converted pretrained weights are CONSUMED by the runtime (not just
convertible): classifier.pretrained, loss.vgg_weights / loss.lpips_weights,
and the eval LPIPS calibration naming (reference behavior: pretrained VGG16
in the content loss, loss.py:19-38; pretrained backbone, classifier.py:24)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adam_dehaze_tpu.config import load_config
from adam_dehaze_tpu.training import checkpoint as ckpt


def _fake_vgg16_sd(rng, deepest=13):
    widths = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
              (256, 256), (256, 256), (512, 256), (512, 512), (512, 512),
              (512, 512), (512, 512), (512, 512)]
    sd = {}
    for idx, (o, i) in zip((0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28),
                           widths):
        # He-ish scale so 13 stacked layers don't overflow f32 (raw
        # std-normal kernels blow activations up ~sqrt(9*i) per layer).
        scale = np.sqrt(2.0 / (9 * i))
        sd[f"features.{idx}.weight"] = (scale * rng.standard_normal(
            (o, i, 3, 3))).astype(np.float32)
        sd[f"features.{idx}.bias"] = (0.01 * rng.standard_normal(o)
                                      ).astype(np.float32)
    return sd


@pytest.fixture
def cfg(tmp_path):
    c = load_config()
    c["tpu"]["compute_dtype"] = "float32"
    c["dataset"]["img_size"] = 16
    return c


def test_loss_consumes_converted_vgg_and_lpips(cfg, key, rng, tmp_path):
    # 64x64: the AlexNet LPIPS trunk needs >=~32px or deep taps are
    # zero-size (empty mean -> NaN).
    from adam_dehaze_tpu.losses.dehazing import get_dehazing_loss
    from adam_dehaze_tpu.losses.lpips import LPIPS
    from adam_dehaze_tpu.nn.vgg import VGG16Features
    from adam_dehaze_tpu.training.checkpoint import (
        load_torch_lpips,
        load_torch_vgg16,
    )

    # Convert synthetic torchvision/lpips-convention weights -> orbax.
    net = VGG16Features()
    vgg_vars = net.init(key, jnp.zeros((1, 64, 64, 3)))
    vgg_conv = _fake_vgg16_sd(rng)
    vgg_tree = load_torch_vgg16(vgg_conv, vgg_vars)
    vgg_path = ckpt.save_checkpoint(str(tmp_path), "vgg16", vgg_tree)

    m = LPIPS()
    x0 = jnp.zeros((1, 64, 64, 3))
    lp_vars = m.init(key, x0, x0)
    chans = [64, 192, 384, 256, 256]
    heads = {f"lin{i}.model.1.weight":
             np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32)
             for i, c in enumerate(chans)}
    lp_tree = load_torch_lpips(heads, lp_vars)
    lp_path = ckpt.save_checkpoint(str(tmp_path), "lpips", lp_tree)

    cfg["loss"]["vgg_weights"] = vgg_path
    cfg["loss"]["lpips_weights"] = lp_path
    loss = get_dehazing_loss(cfg)
    loss_params = loss.init(jax.random.PRNGKey(3), (1, 64, 64, 3))

    got = np.asarray(loss_params["content"]["params"]["conv1_1"]["kernel"])
    np.testing.assert_allclose(
        got, np.transpose(vgg_conv["features.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(loss_params["lpips"]["params"]["lin0"]),
        heads["lin0.model.1.weight"].reshape(-1))

    # The loss still runs (and differs from a random-init loss).
    a = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    total, comps = loss(loss_params, a, b)
    assert np.isfinite(float(total))


def test_train_step_carries_converted_loss_nets(cfg, key, rng, tmp_path):
    """One dehazing train step with converted VGG weights: the content term
    is computed from the converted kernels (differs from random-init)."""
    from adam_dehaze_tpu.losses.dehazing import get_dehazing_loss
    from adam_dehaze_tpu.nn.vgg import VGG16Features
    from adam_dehaze_tpu.training.checkpoint import load_torch_vgg16

    net = VGG16Features()
    vgg_vars = net.init(key, jnp.zeros((1, 16, 16, 3)))
    vgg_tree = load_torch_vgg16(_fake_vgg16_sd(rng), vgg_vars)
    vgg_path = ckpt.save_checkpoint(str(tmp_path), "vgg16", vgg_tree)

    a = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))

    cfg["loss"]["vgg_weights"] = vgg_path
    loss_c = get_dehazing_loss(cfg)
    lp_c = loss_c.init(jax.random.PRNGKey(3), (1, 16, 16, 3))
    cfg["loss"]["vgg_weights"] = None
    loss_r = get_dehazing_loss(cfg)
    lp_r = loss_r.init(jax.random.PRNGKey(3), (1, 16, 16, 3))

    _, comps_c = loss_c(lp_c, a, b)
    _, comps_r = loss_r(lp_r, a, b)
    assert float(comps_c["content"]) != pytest.approx(
        float(comps_r["content"]))


def test_classifier_pretrained_backbone_path(cfg, key, rng, tmp_path):
    from adam_dehaze_tpu.nn.resnet import resnet18
    from adam_dehaze_tpu.training.train_classifier import _init_state
    from adam_dehaze_tpu.models.classifier import create_classifier
    from test_converters import _fake_resnet18_sd
    from adam_dehaze_tpu.training.checkpoint import load_torch_resnet

    bb = resnet18()
    bb_vars = bb.init(key, jnp.zeros((1, 16, 16, 3)))
    sd = _fake_resnet18_sd(rng)
    params, stats = load_torch_resnet(sd, bb_vars["params"],
                                      bb_vars["batch_stats"])
    path = ckpt.save_checkpoint(str(tmp_path), "backbone",
                                {"params": params, "batch_stats": stats})

    cfg["classifier"]["pretrained"] = path
    model = create_classifier(cfg)
    state, _ = _init_state(model, cfg, key, 16)
    got = np.asarray(state.params["ResNet_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(got,
                               np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))


def test_classifier_pretrained_bool_is_noop(cfg, key, capsys):
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.training.train_classifier import _init_state

    cfg["classifier"]["pretrained"] = True
    model = create_classifier(cfg)
    state, _ = _init_state(model, cfg, key, 16)
    assert "ignored" in capsys.readouterr().out


def test_lpips_metric_naming(rng, key, tmp_path):
    """Uncalibrated LPIPS is reported as lpips_uncal; converted weights earn
    the published metric name."""
    from adam_dehaze_tpu.evaluation.metrics import ImageQualityMetrics
    from adam_dehaze_tpu.losses.lpips import LPIPS
    from adam_dehaze_tpu.training.checkpoint import load_torch_lpips

    a = rng.random((2, 16, 16, 3), dtype=np.float32)
    b = np.clip(a + 0.05, 0, 1).astype(np.float32)

    iq = ImageQualityMetrics(image_shape=(1, 16, 16, 3))
    iq.add_batch(a, b)
    assert "lpips_uncal" in iq.compute_averages()["all"]

    m = LPIPS()
    x0 = jnp.zeros((1, 16, 16, 3))
    lp_vars = m.init(key, x0, x0)
    heads = {f"lin{i}.model.1.weight":
             np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32)
             for i, c in enumerate([64, 192, 384, 256, 256])}
    lp_path = ckpt.save_checkpoint(str(tmp_path), "lpips",
                                   load_torch_lpips(heads, lp_vars))
    iq2 = ImageQualityMetrics(image_shape=(1, 16, 16, 3),
                              lpips_weights=lp_path)
    iq2.add_batch(a, b)
    avg = iq2.compute_averages()["all"]
    assert "lpips" in avg and "lpips_uncal" not in avg
