"""Serving-time resolution scheduling (ops/resolution.py): the guided-filter
joint upsample and the low-res branch-apply wrapper.

These verify the PLUMBING is exact where it should be (identity branches,
constant corrections, shape contracts, engine integration); the quality side
of the dial is measured on the trained system by tools/probe_lowres.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.models.routing import BinnedAdaptiveEngine
from adam_dehaze_tpu.nn.blocks import resize_bilinear
from adam_dehaze_tpu.ops.resolution import guided_upsample, make_lowres_apply


@pytest.fixture
def x(key):
    return jax.random.uniform(key, (4, 32, 32, 3))


def test_guided_upsample_same_res_radius0_is_identity(key):
    g = jax.random.uniform(key, (2, 16, 16))
    s = jax.random.uniform(jax.random.fold_in(key, 1), (2, 16, 16, 3))
    out = guided_upsample(g, g, s, radius=0, eps=1e-6)
    # radius-0 boxes are per-pixel: var_g = 0 -> a = 0, b = s -> out = s
    # (up to fp cancellation in cov/(0+eps), hence the loose atol).
    np.testing.assert_allclose(np.asarray(out), np.asarray(s), atol=2e-3)


def test_guided_upsample_constant_src(key):
    g_hi = jax.random.uniform(key, (2, 32, 32))
    g_lo = jnp.asarray(resize_bilinear(g_hi[..., None], (16, 16))[..., 0])
    s = jnp.full((2, 16, 16, 3), 0.37)
    out = guided_upsample(g_hi, g_lo, s, radius=2)
    # A constant map must upsample to (approximately) the same constant.
    np.testing.assert_allclose(np.asarray(out), 0.37, atol=1e-3)


def test_guided_upsample_shapes(key):
    g_hi = jax.random.uniform(key, (3, 64, 64))
    g_lo = jax.random.uniform(jax.random.fold_in(key, 1), (3, 16, 16))
    s = jax.random.uniform(jax.random.fold_in(key, 2), (3, 16, 16, 5))
    assert guided_upsample(g_hi, g_lo, s).shape == (3, 64, 64, 5)


@pytest.mark.parametrize("mode", ["guided", "bilinear"])
def test_lowres_identity_branch_is_exact(x, mode):
    # Identity branch -> zero correction -> the wrapper must return x
    # EXACTLY (the image itself never goes through the resample pair).
    fn = make_lowres_apply(lambda v: v, scale=2, mode=mode)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("mode", ["guided", "bilinear"])
def test_lowres_constant_correction(x, mode):
    fn = make_lowres_apply(lambda v: jnp.clip(v + 0.1, 0, 1), scale=2,
                           mode=mode)
    ref = jnp.clip(x + 0.1, 0, 1)
    # Interior agreement; edges may deviate slightly under the box filters.
    got = np.asarray(fn(x))[:, 4:-4, 4:-4]
    want = np.asarray(ref)[:, 4:-4, 4:-4]
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_lowres_mode_validation():
    with pytest.raises(ValueError):
        make_lowres_apply(lambda v: v, mode="nearest")


def test_lowres_apply_runs_at_reduced_resolution(x):
    seen = []

    def probe(v):
        seen.append(v.shape)
        return v

    make_lowres_apply(probe, scale=2, mode="guided")(x)
    assert seen == [(4, 16, 16, 3)]


def test_lowres_composes_with_spill(key, x):
    """Capacity-spill and the resolution dial are orthogonal engine options:
    identity branches make the composed output exactly checkable."""
    def classifier(img):
        n = img.shape[0]
        # Skewed traffic: all but one image in class 2 forces spill handling.
        cls = jnp.where(jnp.arange(n) == 0, 0, 2)
        return jax.nn.one_hot(cls, 3) * 10.0, {}

    ident = lambda v: v
    eng = BinnedAdaptiveEngine(
        classifier,
        [ident, ident, make_lowres_apply(ident, mode="guided")],
        buckets=(2,))
    out, intensity = eng(x, spill=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    assert intensity.shape == (x.shape[0],)


def test_binned_engine_with_lowres_branch(key, x):
    """Engine integration: a low-res-wrapped branch routes and reassembles
    exactly like a full-res one (identity branches make it checkable)."""
    def classifier(img):
        n = img.shape[0]
        logits = jax.nn.one_hot(jnp.arange(n) % 3, 3) * 10.0
        return logits, {}

    def mul(c):
        return lambda v: jnp.clip(v * c, 0.0, 1.0)

    full = BinnedAdaptiveEngine(classifier, [mul(1.0), mul(1.0), mul(1.0)])
    wrapped = BinnedAdaptiveEngine(
        classifier,
        [mul(1.0), mul(1.0), make_lowres_apply(mul(1.0), mode="guided")])
    out_full, int_full = full(x)
    out_lo, int_lo = wrapped(x)
    np.testing.assert_array_equal(np.asarray(int_full), np.asarray(int_lo))
    np.testing.assert_allclose(np.asarray(out_lo), np.asarray(out_full),
                               atol=1e-6)
