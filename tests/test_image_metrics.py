import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.ops.image import batch_quality, psnr, ssim_gray


def _np_psnr(pred, target, dr=1.0):
    mse = np.mean((pred - target) ** 2)
    return 10 * np.log10(dr ** 2 / mse)


def _np_valid_uniform(x, size):
    """VALID-mode uniform filter, direct implementation."""
    h, w = x.shape
    out = np.zeros((h - size + 1, w - size + 1))
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            out[i, j] = x[i:i + size, j:j + size].mean()
    return out


def _np_ssim(x, y, dr=1.0, win=7):
    """Independent port of skimage.structural_similarity defaults."""
    NP = win * win
    cov_norm = NP / (NP - 1)
    ux = _np_valid_uniform(x, win)
    uy = _np_valid_uniform(y, win)
    uxx = _np_valid_uniform(x * x, win)
    uyy = _np_valid_uniform(y * y, win)
    uxy = _np_valid_uniform(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1, C2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
    s = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    return s.mean()


def test_psnr_matches_numpy(rng):
    a = rng.random((3, 16, 16, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    got = np.asarray(psnr(jnp.asarray(b), jnp.asarray(a)))
    for i in range(3):
        np.testing.assert_allclose(got[i], _np_psnr(b[i], a[i]), rtol=1e-4)


def test_psnr_identical_images_is_large(rng):
    a = rng.random((1, 8, 8, 3)).astype(np.float32)
    assert float(psnr(jnp.asarray(a), jnp.asarray(a))[0]) > 100


def test_ssim_matches_skimage_algorithm(rng):
    a = rng.random((2, 20, 20, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    got = np.asarray(ssim_gray(jnp.asarray(b), jnp.asarray(a)))
    for i in range(2):
        want = _np_ssim(b[i].mean(-1), a[i].mean(-1))
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_ssim_bounds(rng):
    a = rng.random((1, 16, 16, 3)).astype(np.float32)
    s_same = float(ssim_gray(jnp.asarray(a), jnp.asarray(a))[0])
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)
    noisy = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(np.float32)
    assert float(ssim_gray(jnp.asarray(noisy), jnp.asarray(a))[0]) < s_same


def test_ssim_bounded_on_flat_images(rng):
    """Near-flat images stress the variance-cancellation path: SSIM must stay
    <= 1 (regression for the TPU bf16-conv precision bug; ops/image.py pins
    precision=HIGHEST)."""
    flat = np.full((2, 64, 64, 3), 0.5, np.float32)
    flat += rng.normal(0, 0.01, flat.shape).astype(np.float32)
    noisy = np.clip(flat + rng.normal(0, 0.02, flat.shape), 0, 1).astype(np.float32)
    assert float(ssim_gray(jnp.asarray(flat), jnp.asarray(flat)).max()) <= 1 + 1e-5
    assert float(ssim_gray(jnp.asarray(noisy), jnp.asarray(flat)).max()) <= 1.0


def test_batch_quality(rng):
    a = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    q = batch_quality(a, a)
    assert q["psnr"].shape == (2,)
    assert q["ssim"].shape == (2,)
