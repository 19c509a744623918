"""In-env LPIPS calibration (tools/calibrate_lpips.py) + label honesty."""
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("corpus")
    d = root / "train" / "low" / "clear"
    os.makedirs(d)
    rng = np.random.default_rng(0)
    for i in range(10):
        img = (rng.uniform(0, 1, (96, 96, 3)) * 255).astype(np.uint8)
        # add structure so blur/pixelate actually destroy something
        img[::8] = 255
        img[:, ::8] = 0
        cv2.imwrite(str(d / f"img{i}.png"), img)
    return str(root)


@pytest.fixture(scope="module")
def cal_ckpt(tiny_corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("cal") / "lpips_cal"
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools/calibrate_lpips.py"),
         "--corpus", tiny_corpus, "--out", str(out), "--patches", "8",
         "--size", "64", "--steps", "60"],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, PYTHONPATH=ROOT))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "val ranking accuracy" in r.stdout
    return str(out)


@pytest.mark.slow
def test_calibrated_metric_label_and_monotonicity(cal_ckpt):
    import jax
    import jax.numpy as jnp

    from adam_dehaze_tpu.evaluation.metrics import ImageQualityMetrics

    iq = ImageQualityMetrics(image_shape=(1, 64, 64, 3),
                             lpips_weights=cal_ckpt)
    assert iq.lpips_key == "lpips_cal_synth"

    rng = np.random.default_rng(1)
    clean = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    mild = np.clip(clean + rng.normal(0, 0.03, clean.shape), 0, 1) \
        .astype(np.float32)
    harsh = np.clip(clean + rng.normal(0, 0.2, clean.shape), 0, 1) \
        .astype(np.float32)
    m_mild = iq._batch_metrics(jnp.asarray(mild), jnp.asarray(clean))
    m_harsh = iq._batch_metrics(jnp.asarray(harsh), jnp.asarray(clean))
    d_mild = np.asarray(m_mild["lpips_cal_synth"])
    d_harsh = np.asarray(m_harsh["lpips_cal_synth"])
    assert (d_harsh > d_mild).all()
    assert (d_mild > 0).all()

    # heads were actually fitted (non-uniform)
    lin = np.asarray(iq.lpips_params["params"]["lin0"])
    assert lin.std() > 1e-6


def test_uncalibrated_label_unchanged():
    from adam_dehaze_tpu.evaluation.metrics import ImageQualityMetrics

    iq = ImageQualityMetrics(image_shape=(1, 32, 32, 3))
    assert iq.lpips_key == "lpips_uncal"
