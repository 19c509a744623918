import jax
import jax.numpy as jnp

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.models.classifier import FogIntensityClassifier, create_classifier
from adam_dehaze_tpu.utils.helpers import count_params


def test_resnet18_classifier_forward_and_params(key):
    m = FogIntensityClassifier(model_name="resnet18")
    x = jax.random.uniform(key, (2, 64, 64, 3))
    vars_ = m.init(key, x)
    logits, features = m.apply(vars_, x)
    assert logits.shape == (2, 3)
    assert features.shape == (2, 512)
    # torchvision resnet18 backbone (11,176,512) + head (131,328 + 771).
    assert count_params(vars_["params"]) == 11_308_611


def test_classifier_train_mode_dropout(key):
    m = FogIntensityClassifier(model_name="resnet18")
    x = jax.random.uniform(key, (2, 32, 32, 3))
    vars_ = m.init(key, x)
    (l1, _), _ = m.apply(vars_, x, True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    (l2, _), _ = m.apply(vars_, x, True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    # Different dropout keys give different logits in train mode.
    assert float(jnp.abs(l1 - l2).max()) > 0


def test_mobilenet_classifier(key):
    m = FogIntensityClassifier(model_name="mobilenet_v2")
    x = jax.random.uniform(key, (1, 64, 64, 3))
    vars_ = m.init(key, x)
    logits, features = m.apply(vars_, x)
    assert logits.shape == (1, 3)
    assert features.shape == (1, 1280)


def test_create_classifier_from_config(key):
    cfg = default_config()
    cfg["tpu"]["compute_dtype"] = "float32"
    m = create_classifier(cfg)
    assert m.model_name == "resnet18"
    assert m.feature_dim == 512
