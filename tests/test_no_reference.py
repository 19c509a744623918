"""No-reference quality proxies (evaluation/no_reference.py).

The contract is directional: both proxies must rank clean images above
degraded ones — that is the property the BASELINE.md BRISQUE/NIMA rows
actually use (hazy -> dehazed improvement deltas)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.data.synthetic import apply_fog
from adam_dehaze_tpu.evaluation.no_reference import (
    QualityHead,
    brisque_proxy_scores,
    fit_pristine,
    load_pristine,
    nss_features,
    save_pristine,
)


def _natural_batch(rng, n=6, size=64):
    """Smooth 'natural-ish' images: random low-frequency fields."""
    base = rng.random((n, 8, 8, 3)).astype(np.float32)
    img = jax.image.resize(jnp.asarray(base), (n, size, size, 3), "bicubic")
    return jnp.clip(img, 0.0, 1.0)


def test_nss_features_shape_and_finite(rng):
    imgs = _natural_batch(rng)
    f = nss_features(imgs)
    assert f.shape == (6, 36)
    assert bool(jnp.isfinite(f).all())


def test_brisque_proxy_prefers_clean(rng, key):
    clean = _natural_batch(rng, n=8)
    pristine = fit_pristine([clean])
    hazy = apply_fog(clean, jnp.full((8,), 0.9), jnp.full((8,), 0.95))
    noisy = jnp.clip(clean + 0.25 * jax.random.normal(key, clean.shape), 0, 1)
    s_clean = brisque_proxy_scores(clean, pristine).mean()
    s_hazy = brisque_proxy_scores(hazy, pristine).mean()
    s_noisy = brisque_proxy_scores(noisy, pristine).mean()
    assert s_hazy > s_clean  # lower = more natural
    assert s_noisy > s_clean


def test_pristine_roundtrip(tmp_path, rng):
    clean = _natural_batch(rng, n=4)
    pristine = fit_pristine([clean])
    p = str(tmp_path / "pristine.npz")
    save_pristine(p, pristine)
    back = load_pristine(p)
    np.testing.assert_allclose(back["mu"], pristine["mu"])
    np.testing.assert_allclose(back["cov"], pristine["cov"])
    assert load_pristine(str(tmp_path / "missing.npz")) is None


def test_quality_head_mos_range(key):
    model = QualityHead(features=8)
    params = model.init(key, jnp.zeros((2, 64, 64, 3)))
    logits = model.apply(params, jnp.zeros((2, 64, 64, 3)))
    mos = QualityHead.mos(logits)
    assert mos.shape == (2,)
    assert float(mos.min()) >= 1.0 and float(mos.max()) <= 10.0


@pytest.mark.slow
def test_quality_head_learns_ranking(tmp_path, rng):
    """A few hundred tiny steps must suffice for the head to rank clear
    above heavy fog — the property evaluate's nima_proxy row relies on."""
    import optax

    from adam_dehaze_tpu.evaluation.no_reference import _distort_batch

    model = QualityHead(features=8)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    bins = jnp.arange(1, 11, dtype=jnp.float32)

    @jax.jit
    def step(params, opt_state, clear, key):
        kd, kk = jax.random.split(key)
        imgs, mos = _distort_batch(kd, clear)

        def loss_fn(p):
            logits = model.apply(p, imgs)
            target = jax.nn.softmax(
                -((bins[None, :] - mos[:, None]) ** 2) / (2 * 0.7 ** 2), -1)
            return -jnp.mean(
                jnp.sum(target * jax.nn.log_softmax(logits, -1), -1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, kk

    clear = _natural_batch(rng, n=6)
    for _ in range(120):
        params, opt_state, key = step(params, opt_state, clear, key)

    hazy = apply_fog(clear, jnp.full((6,), 0.9), jnp.full((6,), 0.95))
    mos_clear = QualityHead.mos(model.apply(params, clear)).mean()
    mos_hazy = QualityHead.mos(model.apply(params, hazy)).mean()
    assert float(mos_clear) > float(mos_hazy)
