"""No-reference image quality: BRISQUE-analog + NIMA-analog proxies.

The reference's README reports three no-reference rows on RTTS — FADE
0.828, BRISQUE 11.961, NIMA 5.346 (reference: README.md:140) — but ships
none of the implementations (no FADE/BRISQUE/NIMA code anywhere in the
repo; the numbers come from its offline evaluation). In this environment
the published models behind BRISQUE (an SVR fit on LIVE opinion scores)
and NIMA (an ImageNet CNN fit on AVA) cannot be downloaded, so this module
provides two HONEST in-env stand-ins, clearly labeled `_proxy` and emitted
by the evaluator next to `fade_proxy`:

- `brisque_proxy` — an opinion-UNAWARE naturalness score in the NIQE
  family (Mittal et al., "Making a 'Completely Blind' Image Quality
  Analyzer"): MSCN (mean-subtracted contrast-normalised) coefficients are
  fit with a generalised Gaussian, their four orientation products with
  asymmetric GGDs, at two scales; quality is the Mahalanobis distance of
  an image's 36-feature vector from a pristine multivariate-Gaussian model
  fit on the corpus's CLEAR split. Lower is better, same direction as
  published BRISQUE, but NOT on the published 0-100 scale.
- `nima_proxy` — a small learned distribution head in NIMA's shape
  (10-bin score distribution, mean-opinion-score readout on a 1-10
  scale): a 4-stage convnet trained in-env on corpus triplets plus
  synthetic distortions (fog ladder, blur, noise), with targets distilled
  from the full-reference SSIM-to-clear consensus. Higher is better, same
  direction as published NIMA, but the absolute scale is corpus-defined.

Everything is batched jax: the feature extractor is one jittable program
per image batch (no per-patch host loops), and GGD/AGGD shape estimation
uses a static moment-ratio lookup table so it stays inside jit.
"""
from __future__ import annotations

import math
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# MSCN / natural scene statistics (BRISQUE-analog)
# ---------------------------------------------------------------------------

_C = 1e-3  # MSCN stabiliser (BRISQUE uses 1/255-scale images; ours are [0,1])


def _gaussian_kernel(size: int = 7, sigma: float = 7.0 / 6.0) -> jnp.ndarray:
    ax = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (ax / sigma) ** 2)
    k2 = jnp.outer(k, k)
    return k2 / jnp.sum(k2)


def _local_moments(gray: jnp.ndarray, kernel: jnp.ndarray):
    """Gaussian-weighted local mean/std of (B, H, W) images."""
    k = kernel[:, :, None, None]  # HWIO
    x = gray[..., None]  # BHWC, C=1
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    mu = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                      dimension_numbers=dn)[..., 0]
    mu2 = jax.lax.conv_general_dilated(x * x, k, (1, 1), "SAME",
                                       dimension_numbers=dn)[..., 0]
    sigma = jnp.sqrt(jnp.maximum(mu2 - mu * mu, 0.0))
    return mu, sigma


def mscn(gray: jnp.ndarray, kernel: Optional[jnp.ndarray] = None):
    """Mean-subtracted contrast-normalised coefficients of (B, H, W)."""
    if kernel is None:
        kernel = _gaussian_kernel()
    mu, sigma = _local_moments(gray, kernel)
    return (gray - mu) / (sigma + _C)


# GGD shape estimation by moment matching: rho = E|x|^2 / E|x|^1^2 is a
# monotone function of alpha; invert with a dense static table (stays
# jittable — jnp.interp over constants).
_ALPHA_GRID = np.arange(0.2, 10.001, 0.001)
_G1 = np.array([math.gamma(1.0 / a) for a in _ALPHA_GRID])
_G2 = np.array([math.gamma(2.0 / a) for a in _ALPHA_GRID])
_G3 = np.array([math.gamma(3.0 / a) for a in _ALPHA_GRID])
_RHO_GGD = _G1 * _G3 / (_G2 ** 2)  # decreasing in alpha
_RHO_GGD_REV = jnp.asarray(_RHO_GGD[::-1].copy())
_ALPHA_REV = jnp.asarray(_ALPHA_GRID[::-1].copy())
# AGGD uses rho_hat adjusted by the left/right sigma ratio; same table.
_GGD_TABLE = (_RHO_GGD_REV, _ALPHA_REV)


def _ggd_params(x: jnp.ndarray, axes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(alpha, sigma^2) of a zero-mean GGD fit over `axes`."""
    e_abs = jnp.mean(jnp.abs(x), axis=axes)
    e_sq = jnp.mean(x * x, axis=axes)
    rho = e_sq / jnp.maximum(e_abs * e_abs, 1e-12)
    alpha = jnp.interp(rho, _GGD_TABLE[0], _GGD_TABLE[1])
    return alpha, e_sq


def _aggd_params(x: jnp.ndarray, axes):
    """(alpha, mean, sigma_l^2, sigma_r^2) of an asymmetric GGD fit.

    Standard BRISQUE estimator (Mittal et al. 2012, eqs. 5-8): separate
    left/right second moments, gamma-ratio moment matching, and the mean
    term eta used as a feature for the pairwise products.
    """
    neg = jnp.where(x < 0, x, 0.0)
    pos = jnp.where(x > 0, x, 0.0)
    n_neg = jnp.maximum(jnp.sum((x < 0).astype(x.dtype), axis=axes), 1.0)
    n_pos = jnp.maximum(jnp.sum((x > 0).astype(x.dtype), axis=axes), 1.0)
    sig_l = jnp.sum(neg * neg, axis=axes) / n_neg
    sig_r = jnp.sum(pos * pos, axis=axes) / n_pos
    gamma_hat = jnp.sqrt(sig_l) / jnp.sqrt(jnp.maximum(sig_r, 1e-12))
    e_abs = jnp.mean(jnp.abs(x), axis=axes)
    e_sq = jnp.mean(x * x, axis=axes)
    rho = e_sq / jnp.maximum(e_abs * e_abs, 1e-12)
    rho_hat = rho * (gamma_hat ** 3 + 1.0) * (gamma_hat + 1.0) / \
        jnp.maximum((gamma_hat ** 2 + 1.0) ** 2, 1e-12)
    alpha = jnp.interp(rho_hat, _GGD_TABLE[0], _GGD_TABLE[1])
    g1 = jnp.interp(alpha, jnp.asarray(_ALPHA_GRID), jnp.asarray(_G1))
    g2 = jnp.interp(alpha, jnp.asarray(_ALPHA_GRID), jnp.asarray(_G2))
    eta = (jnp.sqrt(sig_r) - jnp.sqrt(sig_l)) * g2 / g1
    return alpha, eta, sig_l, sig_r


def _scale_features(gray: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """18 NSS features of (B, H, W) at one scale: GGD(mscn) 2 + AGGD of the
    four orientation products 4x4."""
    m = mscn(gray, kernel)
    feats = list(_ggd_params(m, axes=(1, 2)))
    pairs = (m[:, :, :-1] * m[:, :, 1:],      # horizontal
             m[:, :-1, :] * m[:, 1:, :],      # vertical
             m[:, :-1, :-1] * m[:, 1:, 1:],   # main diagonal
             m[:, :-1, 1:] * m[:, 1:, :-1])   # secondary diagonal
    for p in pairs:
        feats.extend(_aggd_params(p, axes=(1, 2)))
    return jnp.stack(feats, axis=-1)  # (B, 18)


def nss_features(images: jnp.ndarray) -> jnp.ndarray:
    """(B, 36) natural-scene-statistics features of NHWC [0,1] images
    (18 at full scale + 18 at half scale, BRISQUE's two-scale recipe)."""
    gray = jnp.asarray(images, jnp.float32) @ jnp.asarray(
        [0.299, 0.587, 0.114], jnp.float32)
    kernel = _gaussian_kernel()
    f1 = _scale_features(gray, kernel)
    half = jax.image.resize(
        gray, (gray.shape[0], gray.shape[1] // 2, gray.shape[2] // 2),
        method="bilinear")
    f2 = _scale_features(half, kernel)
    return jnp.concatenate([f1, f2], axis=-1)


def fit_pristine(clear_images, batch_size: int = 16) -> Dict[str, np.ndarray]:
    """Fit the pristine MVG (mean, covariance) on clear images.

    `clear_images`: iterable of NHWC [0,1] arrays (batches). Returns the
    model dict {mu (36,), cov (36,36)} — NIQE's opinion-unaware reference,
    fit on THIS corpus's haze-free split instead of the original authors'
    pristine photographs (in-env honesty: the scale is corpus-defined).
    """
    feat_fn = jax.jit(nss_features)
    rows = []
    for batch in clear_images:
        b = jnp.asarray(batch)
        for i in range(0, b.shape[0], batch_size):
            rows.append(np.asarray(feat_fn(b[i:i + batch_size])))
    f = np.concatenate(rows, axis=0)
    mu = f.mean(axis=0)
    cov = np.cov(f, rowvar=False)
    return {"mu": mu, "cov": cov}


def pristine_from_features(feats: np.ndarray) -> Dict[str, np.ndarray]:
    """Pristine MVG from an already-computed (N, 36) feature matrix —
    lets the evaluator fit the model from features accumulated in its
    single test-split pass instead of a second pass over the images."""
    return {"mu": feats.mean(axis=0), "cov": np.cov(feats, rowvar=False)}


def mahalanobis_scores(feats: np.ndarray,
                       pristine: Dict[str, np.ndarray]) -> np.ndarray:
    """NIQE-style distance of (N, 36) features from the pristine MVG
    (regularised covariance; lower = more natural)."""
    mu = pristine["mu"]
    cov = np.asarray(pristine["cov"])
    cov = cov + np.eye(cov.shape[0]) * (1e-6 * np.trace(cov) / cov.shape[0])
    d = feats - mu[None, :]
    sol = np.linalg.solve(cov, d.T).T
    return np.sqrt(np.maximum(np.sum(d * sol, axis=1), 0.0))


def brisque_proxy_scores(images: jnp.ndarray,
                         pristine: Dict[str, np.ndarray]) -> np.ndarray:
    """Per-image naturalness distance (lower = more natural).

    NIQE-style Mahalanobis distance using the pristine covariance
    (regularised); one jitted feature program + a small host solve.
    """
    f = np.asarray(jax.jit(nss_features)(jnp.asarray(images)))
    return mahalanobis_scores(f, pristine)


def save_pristine(path: str, model: Dict[str, np.ndarray]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **model)


def load_pristine(path: str) -> Optional[Dict[str, np.ndarray]]:
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return {"mu": z["mu"], "cov": z["cov"]}


# ---------------------------------------------------------------------------
# Learned quality head (NIMA-analog)
# ---------------------------------------------------------------------------

import flax.linen as nn  # noqa: E402  (kept below the pure-numpy section)


class QualityHead(nn.Module):
    """Tiny NIMA-shaped scorer: conv trunk -> 10-bin score distribution.

    The readout is the distribution mean on a 1-10 scale, exactly NIMA's
    MOS readout (Talebi & Milanfar 2018) — but the trunk is a from-scratch
    4-stage convnet sized for in-env training, not ImageNet MobileNet.
    """
    features: int = 24

    @nn.compact
    def __call__(self, x):
        f = self.features
        for i in range(4):
            x = nn.Conv(f * (2 ** i), (3, 3), strides=(2, 2))(x)
            x = nn.gelu(x)
        x = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(10)(x)
        return logits

    @staticmethod
    def mos(logits: jnp.ndarray) -> jnp.ndarray:
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.sum(p * jnp.arange(1, 11, dtype=p.dtype), axis=-1)


def _distort_batch(key, clear: jnp.ndarray):
    """(images, target_mos) training pairs from one clear batch.

    Distortions: identity, fog ladder (3 betas), 2x box blur, gaussian
    noise. Targets distill the full-reference consensus: SSIM to clear,
    affinely mapped to the 1-10 MOS scale (ssim 1.0 -> 9.5, 0.2 -> 2.0).
    """
    from adam_dehaze_tpu.data.synthetic import apply_fog
    from adam_dehaze_tpu.ops.image import ssim_gray

    ks = jax.random.split(key, 4)
    n = clear.shape[0]
    variants = [clear]
    for beta in (0.3, 0.6, 0.9):
        a = jax.random.uniform(ks[0], (n,), minval=0.6, maxval=0.95)
        variants.append(apply_fog(clear, jnp.full((n,), beta), a))
    blur = jax.lax.reduce_window(
        clear, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 1, 1, 1), "SAME") / 16.0
    variants.append(blur)
    noisy = jnp.clip(
        clear + 0.1 * jax.random.normal(ks[1], clear.shape), 0.0, 1.0)
    variants.append(noisy)
    imgs = jnp.concatenate(variants, axis=0)
    ref = jnp.concatenate([clear] * len(variants), axis=0)
    ssim = ssim_gray(imgs, ref)
    mos = jnp.clip(2.0 + (ssim - 0.2) * (9.5 - 2.0) / 0.8, 1.0, 10.0)
    return imgs, mos


def train_quality_head(config, steps: int = 300, lr: float = 1e-3,
                       img_size: int = 128, seed: int = 0,
                       log_every: int = 50):
    """Train the NIMA-analog head on the corpus train split + synthetic
    distortions. Returns (model, params); one jitted train step.

    Loss: soft cross-entropy against a discretised Gaussian around the
    target MOS (sigma 0.7 bins) — the distribution-matching objective NIMA
    uses (EMD there; CE against a soft target is the simpler stand-in with
    the same MOS gradient direction).
    """
    import optax

    from adam_dehaze_tpu.data.dataset import get_dataloader

    model = QualityHead()
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1, img_size, img_size, 3)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    bins = jnp.arange(1, 11, dtype=jnp.float32)

    @jax.jit
    def step(params, opt_state, clear, key):
        kd, kk = jax.random.split(key)
        imgs, mos = _distort_batch(kd, clear)

        def loss_fn(p):
            logits = model.apply(p, imgs)
            target = jax.nn.softmax(
                -((bins[None, :] - mos[:, None]) ** 2) / (2 * 0.7 ** 2),
                axis=-1)
            ce = -jnp.sum(target * jax.nn.log_softmax(logits, -1), axis=-1)
            pred = QualityHead.mos(logits)
            return jnp.mean(ce), jnp.mean(jnp.abs(pred - mos))

        (loss, mae), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, mae, kk

    loader = get_dataloader(config, "train")
    it = iter(loader)
    done = 0
    while done < steps:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            continue
        clear = jnp.asarray(batch["clear"], jnp.float32)
        if clear.shape[1] != img_size:
            clear = jax.image.resize(
                clear, (clear.shape[0], img_size, img_size, 3), "bilinear")
        params, opt_state, loss, mae, key = step(params, opt_state, clear,
                                                 key)
        done += 1
        if log_every and done % log_every == 0:
            print(f"  quality head step {done}/{steps}: "
                  f"ce {float(loss):.4f} mae {float(mae):.3f}")
    return model, params


def save_quality_head(path: str, params) -> None:
    from flax.serialization import to_bytes
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(to_bytes(params))


def load_quality_head(path: str):
    """Returns (model, params) or None if the head was never trained."""
    if not os.path.exists(path):
        return None
    from flax.serialization import from_bytes
    model = QualityHead()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    with open(path, "rb") as f:
        params = from_bytes(params, f.read())
    return model, params


def nima_proxy_scores(images: jnp.ndarray, model, params,
                      img_size: int = 128) -> np.ndarray:
    """Per-image MOS on the 1-10 proxy scale (higher = better)."""
    x = jnp.asarray(images, jnp.float32)
    if x.shape[1] != img_size:
        x = jax.image.resize(x, (x.shape[0], img_size, img_size, 3),
                             "bilinear")
    logits = jax.jit(model.apply)(params, x)
    return np.asarray(QualityHead.mos(logits))
