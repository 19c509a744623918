import jax
import pytest
import jax.numpy as jnp

from adam_dehaze_tpu.models.classifier import FogIntensityClassifier
from adam_dehaze_tpu.nn.efficientnet import EfficientNetB0


@pytest.mark.slow
def test_efficientnet_b0_features(key):
    m = EfficientNetB0()
    x = jax.random.uniform(key, (1, 64, 64, 3))
    vars_ = m.init(key, x)
    feats = m.apply(vars_, x)
    assert feats.shape == (1, 1280)


def test_efficientnet_classifier(key):
    m = FogIntensityClassifier(model_name="efficientnet_b0")
    x = jax.random.uniform(key, (1, 64, 64, 3))
    vars_ = m.init(key, x)
    logits, feats = m.apply(vars_, x)
    assert logits.shape == (1, 3)
    assert feats.shape == (1, 1280)
    assert m.feature_dim == 1280


def test_progressive_test_set(tmp_path, rng):
    import os

    import cv2
    import numpy as np

    from adam_dehaze_tpu.data.synthetic import create_progressive_test_set

    src = tmp_path / "clear"
    src.mkdir()
    for i in range(2):
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(src / f"img{i}.png"), img)
    out = tmp_path / "prog"
    n = create_progressive_test_set(str(src), str(out), fog_levels=3)
    assert n == 6
    files = sorted(os.listdir(out))
    assert "img0_fog1.png" in files and "img1_fog3.png" in files
    # Heavier fog level -> brighter/washed-out image on average.
    l1 = cv2.imread(str(out / "img0_fog1.png")).mean()
    l3 = cv2.imread(str(out / "img0_fog3.png")).mean()
    assert l3 > l1


def test_profiling_benchmark(key):
    from adam_dehaze_tpu.utils.profiling import benchmark, device_flops_estimate

    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((4, 8, 8, 3))
    stats = benchmark(f, x, n_warmup=1, n_iters=3)
    assert stats["sec_per_call"] > 0
    assert stats["items_per_sec"] > 0
    assert device_flops_estimate() > 0


@pytest.mark.slow
def test_mobilenet_v3_param_counts(key):
    """Param counts match torchvision's published mobilenet_v3 numbers
    (total minus the classifier head the reference replaces with Identity,
    reference classifier.py:56-66): small 927,008 / large 2,971,952."""
    import numpy as np
    from adam_dehaze_tpu.nn.mobilenet import MobileNetV3

    golden = {"small": 927_008, "large": 2_971_952}
    for variant, want in golden.items():
        m = MobileNetV3(variant=variant)
        v = m.init(key, jnp.zeros((1, 32, 32, 3)))
        n = sum(np.asarray(l).size
                for l in jax.tree_util.tree_leaves(v["params"]))
        # running stats are buffers, not params, in the torch count
        assert n == want, f"{variant}: {n} != {want}"


@pytest.mark.slow
def test_mobilenet_v3_classifier(key):
    for variant, dim in (("mobilenet_v3_small", 576),
                         ("mobilenet_v3_large", 960)):
        m = FogIntensityClassifier(model_name=variant)
        x = jax.random.uniform(key, (1, 64, 64, 3))
        vars_ = m.init(key, x)
        logits, feats = m.apply(vars_, x)
        assert logits.shape == (1, 3)
        assert feats.shape == (1, dim)
        assert m.feature_dim == dim


def test_mobilenet_v3_converter(key, rng):
    """Synthetic torchvision-naming state dict converts leaf-exact and the
    converted net still runs."""
    import numpy as np
    from adam_dehaze_tpu.nn.mobilenet import (
        MobileNetV3,
        V3_SMALL_CONFIG,
        _make_divisible,
    )
    from adam_dehaze_tpu.training.checkpoint import load_torch_mobilenet_v3

    sd = {}

    def convbn(tp, cout, cin, k, groups=1):
        sd[f"{tp}.0.weight"] = (0.1 * rng.standard_normal(
            (cout, cin // groups, k, k))).astype(np.float32)
        for suffix, val in (("weight", np.ones(cout)), ("bias", np.zeros(cout)),
                            ("running_mean", 0.1 * rng.standard_normal(cout)),
                            ("running_var", np.ones(cout))):
            sd[f"{tp}.1.{suffix}"] = val.astype(np.float32)

    convbn("features.0", 16, 3, 3)
    in_ch = 16
    for i, (k, exp, c, se, hs, s) in enumerate(V3_SMALL_CONFIG, start=1):
        j = 0
        if exp != in_ch:
            convbn(f"features.{i}.block.0", exp, in_ch, 1)
            j = 1
        convbn(f"features.{i}.block.{j}", exp, exp, k, groups=exp)
        j += 1
        if se:
            sq = _make_divisible(exp // 4, 8)
            sd[f"features.{i}.block.{j}.fc1.weight"] = (
                0.1 * rng.standard_normal((sq, exp, 1, 1))).astype(np.float32)
            sd[f"features.{i}.block.{j}.fc1.bias"] = np.zeros(sq, np.float32)
            sd[f"features.{i}.block.{j}.fc2.weight"] = (
                0.1 * rng.standard_normal((exp, sq, 1, 1))).astype(np.float32)
            sd[f"features.{i}.block.{j}.fc2.bias"] = np.zeros(exp, np.float32)
            j += 1
        convbn(f"features.{i}.block.{j}", c, exp, 1)
        in_ch = c
    convbn(f"features.{len(V3_SMALL_CONFIG) + 1}", 576, 96, 1)

    m = MobileNetV3(variant="small")
    v = m.init(key, jnp.zeros((1, 32, 32, 3)))
    params, stats = load_torch_mobilenet_v3(sd, v["params"], v["batch_stats"],
                                            "small")
    import numpy as np
    np.testing.assert_allclose(
        params["Conv_0"]["kernel"],
        np.transpose(sd["features.0.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        params["InvertedResidualV3_0"]["SqueezeExcite_0"]["fc1"]["kernel"],
        np.transpose(sd["features.1.block.1.fc1.weight"][:, :, 0, 0]))
    # Every torch tensor landed somewhere (sizes add up).
    n_torch = sum(v2.size for v2 in sd.values())
    n_flax = sum(np.asarray(l).size
                 for l in jax.tree_util.tree_leaves((params, stats)))
    assert n_torch == n_flax
    y = m.apply({"params": params, "batch_stats": stats},
                jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 576)


@pytest.mark.slow
def test_efficientnet_family(key):
    """B1-B3 compound scaling: correct feature dims, runs, and strictly more
    params up the family."""
    import numpy as np
    from adam_dehaze_tpu.nn.efficientnet import (
        EfficientNet,
        efficientnet_feature_dim,
    )

    dims = {"b0": 1280, "b1": 1280, "b2": 1408, "b3": 1536}
    sizes = {}
    for v, want in dims.items():
        assert efficientnet_feature_dim(v) == want
        m = EfficientNet(variant=v)
        vars_ = m.init(key, jnp.zeros((1, 32, 32, 3)))
        y = m.apply(vars_, jnp.zeros((1, 32, 32, 3)))
        assert y.shape == (1, want)
        sizes[v] = sum(np.asarray(l).size
                       for l in jax.tree_util.tree_leaves(vars_["params"]))
    assert sizes["b0"] < sizes["b1"] < sizes["b2"] < sizes["b3"]
