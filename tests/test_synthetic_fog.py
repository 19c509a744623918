import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.data.synthetic import (
    INTENSITY_RANGES,
    apply_fog,
    apply_random_fog,
    estimate_transmission_dcp,
    fog_density_map,
    progressive_fog_levels,
    random_fog_params,
)


def _numpy_fog(clear, beta, A):
    """Independent numpy port of the reference model (utils/helpers.py:241-255)."""
    h, w = clear.shape[:2]
    x = np.linspace(0, 1, w)
    y = np.linspace(0, 1, h)
    xx, yy = np.meshgrid(x, y)
    depth = 0.3 + 0.7 * np.sqrt((xx - 0.5) ** 2 + (yy - 0.2) ** 2)
    t = np.exp(-beta * depth)[..., None]
    return np.clip(clear * t + A * (1 - t), 0, 1)


def test_apply_fog_matches_reference_model(rng):
    clear = rng.random((2, 32, 40, 3), dtype=np.float32)
    hazy = apply_fog(jnp.asarray(clear), jnp.array([0.5, 0.9]), jnp.array([0.7, 0.95]))
    expected0 = _numpy_fog(clear[0], 0.5, 0.7)
    expected1 = _numpy_fog(clear[1], 0.9, 0.95)
    np.testing.assert_allclose(np.asarray(hazy[0]), expected0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hazy[1]), expected1, atol=1e-5)


def test_random_fog_params_in_range(key):
    intensity = jnp.array([0, 1, 2, 0, 1, 2])
    beta, A = random_fog_params(key, intensity, 6)
    names = ["low", "medium", "high"]
    for i, cls in enumerate([0, 1, 2, 0, 1, 2]):
        (b_lo, b_hi), (a_lo, a_hi) = INTENSITY_RANGES[names[cls]]
        assert b_lo <= float(beta[i]) <= b_hi
        assert a_lo <= float(A[i]) <= a_hi


def test_apply_random_fog_shapes_and_range(key, rng):
    clear = jnp.asarray(rng.random((4, 16, 16, 3), dtype=np.float32))
    hazy = apply_random_fog(key, clear, jnp.array([0, 1, 2, 2]))
    assert hazy.shape == clear.shape
    assert float(hazy.min()) >= 0.0 and float(hazy.max()) <= 1.0
    # Heavier fog washes the image out more (closer to A on average).
    light = apply_fog(clear, 0.1, 0.8)
    heavy = apply_fog(clear, 1.0, 0.8)
    assert float(jnp.abs(heavy - 0.8).mean()) < float(jnp.abs(light - 0.8).mean())


def test_transmission_dcp_properties(key, rng):
    clear = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    hazy = apply_fog(clear, 0.8, 0.9)
    t = estimate_transmission_dcp(hazy, patch_size=5, radius=4)
    assert t.shape == (2, 32, 32)
    # Hazier image -> lower transmission overall than a clear one.
    t_clear = estimate_transmission_dcp(clear * 0.2, patch_size=5, radius=4)
    assert float(t.mean()) < float(t_clear.mean())


def test_fog_density_map(rng):
    hazy = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    d = fog_density_map(hazy)
    assert d.shape == (1, 16, 16)
    assert float(d.min()) >= 0.0


def test_filters_match_reduce_window(rng):
    """Integral-image box filter and separable min filter agree with direct
    reduce_window formulations."""
    import jax.lax as lax

    from adam_dehaze_tpu.data.synthetic import _box_filter, _min_filter

    x = jnp.asarray(rng.random((2, 21, 17), dtype=np.float32))

    def direct_box(v, radius):
        size = 2 * radius + 1
        window = (1, size, size)
        pad = ((0, 0), (radius, radius), (radius, radius))
        s = lax.reduce_window(v, 0.0, lax.add, window, (1, 1, 1), pad)
        n = lax.reduce_window(jnp.ones_like(v), 0.0, lax.add, window,
                              (1, 1, 1), pad)
        return s / n

    def direct_min(v, size):
        pad = size // 2
        return -lax.reduce_window(
            -v, -jnp.inf, lax.max, (1, size, size), (1, 1, 1),
            ((0, 0), (pad, pad), (pad, pad)))

    for r in (1, 3, 6):
        np.testing.assert_allclose(np.asarray(_box_filter(x, r)),
                                   np.asarray(direct_box(x, r)),
                                   rtol=1e-5, atol=1e-6)
    for s in (3, 7, 15):
        np.testing.assert_allclose(np.asarray(_min_filter(x, s)),
                                   np.asarray(direct_min(x, s)), atol=0)


def test_progressive_levels():
    levels = progressive_fog_levels(5)
    assert len(levels) == 5
    betas = [b for b, _ in levels]
    assert betas == sorted(betas)
    assert abs(levels[-1][0] - 1.0) < 1e-9 and abs(levels[-1][1] - 1.0) < 1e-9


def test_boundary_fog_params_labels_exact(key):
    """Boundary strips stay strictly INSIDE each class's beta range, so the
    intensity label is always exact (data/synthetic.py:boundary_fog_params)."""
    from adam_dehaze_tpu.data.synthetic import boundary_fog_params

    n = 600
    intensity = jnp.asarray(np.tile([0, 1, 2], n // 3))
    beta, A = boundary_fog_params(key, intensity, n, boundary_frac=1.0)
    beta = np.asarray(beta)
    A = np.asarray(A)
    names = ["low", "medium", "high"]
    for cls in range(3):
        (blo, bhi), (alo, ahi) = INTENSITY_RANGES[names[cls]]
        sel = np.asarray(intensity) == cls
        assert beta[sel].min() >= blo - 1e-6
        assert beta[sel].max() <= bhi + 1e-6
        assert A[sel].min() >= alo - 1e-6 and A[sel].max() <= ahi + 1e-6
    # with boundary_frac=1 every beta sits in a 0.08-strip at a class edge
    m = 0.08 + 1e-6
    lo_b = beta[np.asarray(intensity) == 0]
    assert (lo_b >= INTENSITY_RANGES["low"][0][1] - m).all()
    hi_b = beta[np.asarray(intensity) == 2]
    assert (hi_b <= INTENSITY_RANGES["high"][0][0] + m).all()
    med_b = beta[np.asarray(intensity) == 1]
    (mlo, mhi) = INTENSITY_RANGES["medium"][0]
    assert ((med_b <= mlo + m) | (med_b >= mhi - m)).all()
    # and both of medium's edges get traffic
    assert (med_b <= mlo + m).any() and (med_b >= mhi - m).any()


def test_refog_batch_replaces_only_hazy(key, rng):
    from adam_dehaze_tpu.data.synthetic import refog_batch

    clear = jnp.asarray(rng.random((6, 16, 16, 3), dtype=np.float32))
    hazy = jnp.zeros_like(clear)
    batch = {"hazy": hazy, "clear": clear,
             "intensity": jnp.asarray([0, 1, 2, 0, 1, 2])}
    out = refog_batch(key, batch, prob=1.0)
    assert out["clear"] is clear and "intensity" in out
    # fresh fog is never the all-zero placeholder (A*(1-t) > 0 off-center)
    assert float(jnp.abs(out["hazy"]).max()) > 0.05
    out0 = refog_batch(key, batch, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out0["hazy"]), np.asarray(hazy))
