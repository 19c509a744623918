import jax
import jax.numpy as jnp

from adam_dehaze_tpu.models.classifier import FogIntensityClassifier
from adam_dehaze_tpu.nn.efficientnet import EfficientNetB0


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
