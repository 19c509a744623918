import jax
import jax.numpy as jnp

from adam_dehaze_tpu.models.classifier import DenseFeatureExtractor
from adam_dehaze_tpu.parallel.multihost import (
    all_hosts_mean,
    host_data_slice,
    initialize,
)


def test_dense_feature_extractor(key):
    m = DenseFeatureExtractor(model_name="resnet18")
    x = jax.random.uniform(key, (1, 64, 64, 3))
    vars_ = m.init(key, x)
    feats = m.apply(vars_, x)
    assert feats.shape == (1, 2, 2, 512)  # 64 / 32 stride


def test_multihost_single_process():
    info = initialize()
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert host_data_slice(32) == slice(0, 32)
    assert all_hosts_mean(3.5) == 3.5
