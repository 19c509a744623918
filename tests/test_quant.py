"""Int8 quantized serving path (ops/quant.py + AQT): same param trees, high
output fidelity, off by default."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.models.branches import (
    LightweightDehazeModel,
    MediumIntensityDehazeModel,
)
from adam_dehaze_tpu.ops.image import psnr
from adam_dehaze_tpu.ops.quant import conv_kwargs, quantize_apply


def test_conv_kwargs_off_by_default():
    assert conv_kwargs() == {}


@pytest.mark.parametrize("model_cls,ch", [(LightweightDehazeModel, 16),
                                          (MediumIntensityDehazeModel, 16)])
def test_int8_branch_fidelity(key, rng, model_cls, ch):
    """int8 dehazed output stays close to the f32 output (same params)."""
    m = model_cls(base_channels=ch)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    v = m.init(key, x)

    y_f = m.apply(v, x)
    fast = jax.jit(quantize_apply(lambda img: m.apply(v, img)))
    y_q = fast(x)
    assert y_q.shape == y_f.shape
    # Outputs are [0,1] images; int8-vs-f32 should be visually identical.
    p = float(psnr(y_q, y_f).min())
    assert p > 35.0, f"int8 degraded output too much: {p:.1f} dB"
    # Quantization is trace-scoped: a fresh call outside is exactly f32.
    np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(y_f),
                               atol=0)


def test_int8_retrace_reenters_context(key, rng):
    """quantize_apply re-enters the context on every trace (new shape)."""
    m = LightweightDehazeModel(base_channels=8)
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(0, 1, (1, 24, 24, 3)).astype(np.float32))
    v = m.init(key, x1)
    fast = jax.jit(quantize_apply(lambda img: m.apply(v, img)))
    for x in (x1, x2):  # second call retraces at the new shape
        y_q = fast(x)
        y_f = m.apply(v, x)
        assert float(psnr(y_q, y_f).min()) > 35.0
        assert float(jnp.abs(y_q - y_f).max()) > 0  # actually quantized
