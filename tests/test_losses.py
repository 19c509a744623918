import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.losses.dehazing import (
    DehazingLoss,
    JointLoss,
    get_dehazing_loss,
    get_joint_loss,
)
from adam_dehaze_tpu.losses.lpips import LPIPS, lpips_from_unit_range


def test_lpips_zero_for_identical(key):
    m = LPIPS()
    x = jax.random.uniform(key, (2, 32, 32, 3)) * 2 - 1
    params = m.init(key, x, x)
    d = m.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d), np.zeros(2), atol=1e-6)


def test_lpips_monotone_in_noise(key):
    m = LPIPS()
    x = jax.random.uniform(key, (1, 32, 32, 3))
    params = m.init(key, x, x)
    n1 = jnp.clip(x + 0.05 * jax.random.normal(key, x.shape), 0, 1)
    n2 = jnp.clip(x + 0.3 * jax.random.normal(key, x.shape), 0, 1)
    d1 = float(lpips_from_unit_range(m, params, n1, x)[0])
    d2 = float(lpips_from_unit_range(m, params, n2, x)[0])
    assert 0 < d1 < d2


def test_dehazing_loss_components(key):
    loss = DehazingLoss()
    lp = loss.init(key, (1, 32, 32, 3))
    pred = jax.random.uniform(key, (2, 32, 32, 3))
    target = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    total, comps = loss(lp, pred, target)
    assert set(comps) == {"l1", "content", "perceptual", "total"}
    # Weighting contract: total = 1.0*l1 + 0.1*content + 0.1*perceptual
    # (reference: loss.py:150-154).
    want = comps["l1"] + 0.1 * comps["content"] + 0.1 * comps["perceptual"]
    np.testing.assert_allclose(float(total), float(want), rtol=1e-6)
    t0, _ = loss(lp, target, target)
    assert float(t0) < 1e-5


def test_dehazing_loss_density_weighted(key):
    loss = DehazingLoss(density_weighted=True, lambda_density=0.5)
    lp = loss.init(key, (1, 32, 32, 3))
    pred = jax.random.uniform(key, (1, 32, 32, 3))
    target = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    hazy = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    total, comps = loss(lp, pred, target, hazy=hazy)
    assert jnp.isfinite(total)
    # Without a hazy image it degrades to plain L1 weighting.
    total2, _ = loss(lp, pred, target)
    assert jnp.isfinite(total2)


def test_dehazing_loss_is_differentiable(key):
    loss = DehazingLoss()
    lp = loss.init(key, (1, 16, 16, 3))
    target = jax.random.uniform(key, (1, 16, 16, 3))

    def f(pred):
        t, _ = loss(lp, pred, target)
        return t

    g = jax.grad(f)(jnp.full((1, 16, 16, 3), 0.5))
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0


def test_joint_loss(key):
    cfg = default_config()
    cfg["tpu"]["compute_dtype"] = "float32"
    jl = get_joint_loss(cfg)
    assert isinstance(jl, JointLoss)
    lp = jl.init(key, (1, 32, 32, 3))
    pred = jax.random.uniform(key, (2, 32, 32, 3))
    target = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    logits = jax.random.normal(jax.random.PRNGKey(2), (2, 3))
    labels = jnp.array([0, 2])
    total, comps = jl(lp, pred, target, logits, labels)
    want = (cfg["joint_training"]["lambda_dehazing"] * comps["dehazing"]
            + cfg["joint_training"]["lambda_classification"] * comps["classification"]
            + cfg["joint_training"]["lambda_detection"] * comps["detection"])
    np.testing.assert_allclose(float(total), float(want), rtol=1e-6)
    # Without labels the classification term is zero (reference: loss.py:199-202).
    _, comps2 = jl(lp, pred, target)
    assert float(comps2["classification"]) == 0.0


def test_get_dehazing_loss_config(key):
    cfg = default_config()
    cfg["loss"]["density_weighted"] = True
    loss = get_dehazing_loss(cfg)
    assert loss.density_weighted
