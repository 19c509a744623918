import jax
import jax.numpy as jnp
import pytest

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.models.branches import (
    COrunInspiredModel,
    DualBranchAttentionModel,
    EncoderDecoder,
    HighIntensityDehazeModel,
    LightweightDehazeModel,
    LowIntensityUNet,
    MediumIntensityDehazeModel,
    create_branch_models,
)
from adam_dehaze_tpu.utils.helpers import count_params

# Parameter counts of the torch reference models (verified once against
# /root/reference models/dehazing/* with the default config sizes). Conv
# kernels, biases and BN affine params must line up exactly for these to
# match; BN running stats are state (batch_stats), not params, in both
# frameworks' counting.
REF_PARAM_COUNTS = {
    "lightweight": 66_756,
    "low_unet": 317_283,
    "medium": 7_228_835,
    "corun": 2_174_211,
    "high": 16_320_576,
    "dual": 923_888,
}

CASES = [
    ("lightweight", LightweightDehazeModel(base_channels=32, n_blocks=3)),
    ("low_unet", LowIntensityUNet(base_channels=32, n_blocks=3)),
    ("medium", MediumIntensityDehazeModel(base_channels=64, n_blocks=6)),
    ("corun", COrunInspiredModel(base_channels=64, n_blocks=6)),
    ("high", HighIntensityDehazeModel(base_channels=96, n_blocks=9)),
    ("dual", DualBranchAttentionModel(base_channels=96, n_blocks=9)),
]


@pytest.mark.parametrize("name,model", CASES, ids=[c[0] for c in CASES])
def test_branch_forward_and_params(name, model, key):
    x = jax.random.uniform(key, (2, 32, 32, 3))
    vars_ = model.init(key, x)
    y = model.apply(vars_, x)
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
    assert count_params(vars_["params"]) == REF_PARAM_COUNTS[name]


def test_branch_train_mode_mutates_stats(key):
    model = LightweightDehazeModel()
    x = jax.random.uniform(key, (2, 16, 16, 3))
    vars_ = model.init(key, x)
    y, mut = model.apply(vars_, x, True, mutable=["batch_stats"])
    assert y.shape == x.shape
    assert "batch_stats" in mut


def test_encoder_decoder(key):
    model = EncoderDecoder(base_channels=16, n_blocks=3, use_attention=True)
    x = jax.random.uniform(key, (1, 32, 32, 3))
    vars_ = model.init(key, x)
    y = model.apply(vars_, x)
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_factories_default_config(key):
    cfg = default_config()
    cfg["tpu"]["use_pallas"] = False
    cfg["tpu"]["compute_dtype"] = "float32"
    models = create_branch_models(cfg)
    assert set(models) == {"low", "medium", "high"}
    assert isinstance(models["low"], LightweightDehazeModel)
    assert isinstance(models["medium"], MediumIntensityDehazeModel)
    assert isinstance(models["high"], HighIntensityDehazeModel)


def test_lightweight_identity_at_alpha_zero(key):
    """With skip_alpha == 0 the model is exactly the identity — the learnable
    global-skip contract of the low branch (reference: low_intensity.py:43-45).
    """
    model = LightweightDehazeModel()
    x = jax.random.uniform(key, (1, 16, 16, 3))
    vars_ = model.init(key, x)
    vars_ = jax.tree_util.tree_map(lambda v: v, vars_)
    params = dict(vars_["params"])
    params["skip_alpha"] = jnp.zeros(())
    y = model.apply({"params": params, "batch_stats": vars_["batch_stats"]}, x)
    assert float(jnp.abs(y - x).max()) < 1e-6
