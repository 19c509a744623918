"""Joint training steps work for all three router types, and bf16 compute
stays consistent with f32."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.losses.dehazing import get_joint_loss
from adam_dehaze_tpu.training.state import make_optimizer
from adam_dehaze_tpu.training.train_joint import (
    build_router_state,
    make_eval_step,
    make_train_step,
)

import pytest

pytestmark = pytest.mark.slow  # heavy joint-step graphs


def tiny_cfg(routing_type):
    cfg = default_config()
    cfg["dataset"]["img_size"] = 32
    cfg["classifier"]["model"] = "mobilenet_v2"
    for level, ch in (("low", 4), ("medium", 4), ("high", 8)):
        cfg["dehazing"][level].update(channels=ch, blocks=1)
    cfg["routing"]["type"] = routing_type
    cfg["tpu"].update(use_pallas=False, compute_dtype="float32")
    return cfg


@pytest.mark.parametrize("routing_type", ["soft", "hard", "gated"])
def test_joint_step_all_router_types(routing_type, key, rng):
    cfg = tiny_cfg(routing_type)
    router, state, tx = build_router_state(cfg, key)
    joint_loss = get_joint_loss(cfg)
    loss_params = joint_loss.init(jax.random.PRNGKey(0), (1, 32, 32, 3))
    step = make_train_step(router, tx, joint_loss, loss_params,
                           augmentation=False)
    batch = {
        "hazy": jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)),
        "clear": jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)),
        "dehazed": jnp.zeros((2, 32, 32, 3)),
        "intensity": jnp.array([0, 2]),
    }
    # The train step donates its input state — snapshot params first.
    old_params = jax.tree_util.tree_map(jnp.copy, state.params)
    new_state, metrics = step(state, batch, key)
    assert jnp.isfinite(metrics["total"])
    # Classifier params untouched (frozen), branch params changed.
    clf_same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.all(a == b)),
        old_params["classifier"], new_state.params["classifier"]))
    assert clf_same
    # At least one branch's params moved (under hard routing only the
    # selected branches receive gradient — one-hot zeroes the rest).
    moved = []
    for level in ("models_low", "models_medium", "models_high"):
        diffs = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            old_params[level], new_state.params[level]))
        moved.append(max(diffs) > 0)
    assert any(moved)

    eval_step = make_eval_step(router, joint_loss, loss_params)
    m = eval_step(new_state, {**batch, "mask": jnp.array([True, True])})
    assert jnp.isfinite(m["psnr"])


def test_bf16_forward_close_to_f32(key, rng):
    from adam_dehaze_tpu.models.branches import MediumIntensityDehazeModel
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    m32 = MediumIntensityDehazeModel(base_channels=8, dtype=jnp.float32)
    v = m32.init(key, x)
    y32 = m32.apply(v, x)
    m16 = MediumIntensityDehazeModel(base_channels=8, dtype=jnp.bfloat16)
    y16 = m16.apply(v, x)
    assert y16.dtype == jnp.float32  # branches return f32 regardless
    # bf16 forward tracks the f32 forward closely on [0,1] images.
    assert float(jnp.abs(y16 - y32).max()) < 0.05
