import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.models.branches import LightweightDehazeModel
from adam_dehaze_tpu.models.classifier import FogIntensityClassifier
from adam_dehaze_tpu.models.routing import (
    GatedRouter,
    HardRouter,
    SoftRouter,
    create_router,
    make_adaptive_infer,
)


def tiny_models():
    # Three distinct tiny branches (different sizes so outputs differ).
    return {
        "low": LightweightDehazeModel(base_channels=4, n_blocks=1),
        "medium": LightweightDehazeModel(base_channels=6, n_blocks=1),
        "high": LightweightDehazeModel(base_channels=8, n_blocks=1),
    }


@pytest.fixture
def x(key):
    return jax.random.uniform(key, (4, 16, 16, 3))


def test_hard_router_equals_per_image_branch(key, x):
    router = HardRouter(models=tiny_models())
    intensity = jnp.array([0, 1, 2, 1])
    vars_ = router.init(key, x, intensity)
    routed, info = router.apply(vars_, x, intensity)
    assert routed.shape == x.shape
    assert bool(jnp.all(info["intensity"] == intensity))
    assert bool(jnp.all(info["low_mask"] == (intensity == 0)))

    # Each image must equal running its own branch alone — the mask-scatter
    # contract of the reference (routing.py:45-61).
    names = ["low", "medium", "high"]
    for i in range(4):
        branch = names[int(intensity[i])]
        sub = {"params": vars_["params"]["models_" + branch],
               "batch_stats": vars_["batch_stats"]["models_" + branch]}
        solo = tiny_models()[branch].apply(sub, x[i:i + 1])
        np.testing.assert_allclose(np.asarray(routed[i]), np.asarray(solo[0]),
                                   atol=1e-6)


def test_soft_router_blend_composition(key, x):
    router = SoftRouter(models=tiny_models(), temperature=0.5)
    logits = jax.random.normal(jax.random.PRNGKey(7), (4, 3))
    vars_ = router.init(key, x, logits)
    blended, info = router.apply(vars_, x, logits)
    w = info["weights"]
    np.testing.assert_allclose(np.asarray(w.sum(axis=1)), np.ones(4), atol=1e-6)
    manual = sum(
        np.asarray(w[:, i, None, None, None]) * np.asarray(info["individual_outputs"][n])
        for i, n in enumerate(["low", "medium", "high"]))
    np.testing.assert_allclose(np.asarray(blended), manual, atol=1e-6)
    # Temperature softening matches jax.nn.softmax(logits / T).
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(jax.nn.softmax(logits / 0.5, axis=1)), atol=1e-6)


def test_gated_router(key, x):
    clf = FogIntensityClassifier(model_name="resnet18")
    router = GatedRouter(models=tiny_models(), classifier=clf, feature_dim=512)
    vars_ = router.init({"params": key, "dropout": key}, x)
    out, info = router.apply(vars_, x, rngs={"dropout": key})
    assert out.shape == x.shape
    assert info["gate_weights"].shape == (4, 3)
    np.testing.assert_allclose(
        np.asarray(info["gate_weights"].sum(axis=1)), np.ones(4), atol=1e-5)


def test_create_router_types():
    cfg = default_config()
    cfg["tpu"]["use_pallas"] = False
    models = tiny_models()
    clf = FogIntensityClassifier()
    assert isinstance(create_router(models, clf, cfg), SoftRouter)
    cfg["routing"]["type"] = "hard"
    assert isinstance(create_router(models, clf, cfg), HardRouter)
    cfg["routing"]["type"] = "gated"
    assert isinstance(create_router(models, clf, cfg), GatedRouter)
    cfg["routing"]["type"] = "nope"
    with pytest.raises(ValueError):
        create_router(models, clf, cfg)


def test_adaptive_infer_switch_equals_select(key, x):
    """The lax.switch serving path must agree exactly with the one-hot select
    path — the central routing-equivalence guarantee (SURVEY.md §4)."""
    models = tiny_models()
    branch_vars = {n: m.init(jax.random.PRNGKey(i), x)
                   for i, (n, m) in enumerate(models.items())}
    applies = [
        (lambda v, m: (lambda img: m.apply(v, img)))(branch_vars[n], models[n])
        for n in ["low", "medium", "high"]
    ]

    def fake_classifier(img):
        # Deterministic per-image pseudo-logits derived from brightness.
        b = img.mean(axis=(1, 2, 3))
        logits = jnp.stack([b, 2 * b, 3 * b], axis=1)
        return logits, None

    infer_switch = jax.jit(make_adaptive_infer(fake_classifier, applies, "switch"))
    infer_select = jax.jit(make_adaptive_infer(fake_classifier, applies, "select"))
    y_sw, i_sw = infer_switch(x)
    y_sel, i_sel = infer_select(x)
    assert bool(jnp.all(i_sw == i_sel))
    np.testing.assert_allclose(np.asarray(y_sw), np.asarray(y_sel), atol=1e-6)

    infer_soft = jax.jit(make_adaptive_infer(fake_classifier, applies, "soft",
                                             temperature=0.5))
    y_soft, w = infer_soft(x)
    assert y_soft.shape == x.shape
    np.testing.assert_allclose(np.asarray(w.sum(axis=1)), np.ones(4), atol=1e-6)
