"""Fused s2d tail chain (ops/pallas/tail_chain.py) vs the XLA tail.

The reference spec is the tail of make_high_s2d_apply (ops/s2d.py:577-590),
whose composition with the prefix is pinned to the canonical forward by
tools/probe_tail.py's decomposition check. Interpret mode = exact Pallas
semantics on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.models.branches import (
    HighIntensityDehazeModel,
    MediumIntensityDehazeModel,
)
from adam_dehaze_tpu.ops.s2d import (
    _fold_bn,
    _fold_convblock,
    _s2d_residual,
    depth_to_space,
    s2d_attention,
    s2d_concat,
    s2d_conv,
    s2d_conv_kernel,
    s2d_up4,
    space_to_depth,
)
from adam_dehaze_tpu.ops.pallas.tail_chain import (
    make_high_tail_chain,
    make_medium_tail_chain,
)

SIZE = 32
BATCH = 2

# interpret-mode runs at 384 lanes take minutes each
pytestmark = pytest.mark.slow


def _xla_tail(model, variables, dtype):
    """The serving tail exactly as make_high_s2d_apply composes it."""
    p = variables["params"]
    bs = variables["batch_stats"]
    c = model.base_channels
    kg1, tg1 = _fold_convblock(p, bs, "ConvBlock_0")
    kg2, tg2 = _fold_convblock(p, bs, "ConvBlock_1")
    kgo, tgo = p["Conv_0"]["kernel"], p["Conv_0"]["bias"]
    kup, tup_ = _fold_bn(p["UpBlock_1"]["ConvTranspose_0"]["kernel"],
                         p["UpBlock_1"]["BatchNorm_0"]["scale"],
                         p["UpBlock_1"]["BatchNorm_0"]["bias"],
                         bs["UpBlock_1"]["BatchNorm_0"]["mean"],
                         bs["UpBlock_1"]["BatchNorm_0"]["var"])
    s_up = (p["UpBlock_1"]["BatchNorm_0"]["scale"]
            / jnp.sqrt(bs["UpBlock_1"]["BatchNorm_0"]["var"] + 1e-5))
    tup = tup_ + s_up * p["UpBlock_1"]["ConvTranspose_0"]["bias"]
    kh1, th1 = _fold_convblock(p, bs, "ConvBlock_5")
    kh2, th2 = _fold_convblock(p, bs, "ConvBlock_6")
    kout, tout = p["Conv_1"]["kernel"], p["Conv_1"]["bias"]
    kg1s = s2d_conv_kernel(kg1).astype(dtype)
    kg2s = s2d_conv_kernel(kg2).astype(dtype)
    kgos = s2d_conv_kernel(kgo).astype(dtype)
    kh1s = s2d_conv_kernel(kh1).astype(dtype)
    kh2s = s2d_conv_kernel(kh2).astype(dtype)
    kouts = s2d_conv_kernel(kout).astype(dtype)

    def tail(d1, f0s, x2):
        d1 = d1.astype(dtype)
        f0s = f0s.astype(dtype)
        x2 = x2.astype(dtype)
        g = s2d_conv(x2, kg1s, 16, k=3, shift=tg1, relu=True)
        g = s2d_conv(g, kg2s, 16, k=3, shift=tg2, relu=True)
        guidance = jax.nn.sigmoid(s2d_conv(g, kgos, 1, k=1, shift=tgo))
        d2 = s2d_up4(d1, kup.astype(dtype), shift=tup, relu=True)
        d2 = _s2d_residual(d2, p, bs, "ResidualBlock_7", c, dtype)
        d2 = s2d_attention(d2, p["AttentionBlock_5"], c, dtype=dtype)
        d2 = s2d_concat(d2, f0s, c, c)
        h = s2d_conv(d2, kh1s, c, k=3, shift=th1, relu=True)
        h = s2d_conv(h, kh2s, c // 2, k=3, shift=th2, relu=True)
        res = s2d_conv(h, kouts, 3, k=3, shift=tout)
        res = jnp.tanh(res)
        n, h2, w2, _ = res.shape
        res = (res.reshape(n, h2, w2, 4, 3)
               * guidance.reshape(n, h2, w2, 4, 1))
        out = jnp.clip(x2.reshape(n, h2, w2, 4, 3) + res, 0.0, 1.0)
        return depth_to_space(out.reshape(n, h2, w2, 12)).astype(jnp.float32)

    return tail


def _inputs(key, c):
    h2 = SIZE // 2
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (BATCH, SIZE, SIZE, 3), jnp.float32)
    # post-decoder state: non-negative-ish activations like the real d1
    d1 = jax.nn.relu(jax.random.normal(k2, (BATCH, h2, h2, 4 * c)))
    f0s = jax.nn.relu(jax.random.normal(k3, (BATCH, h2, h2, 4 * c)))
    return d1, f0s, space_to_depth(x)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 3e-2)])
def test_tail_chain_matches_xla_tail(key, dtype, tol):
    model = HighIntensityDehazeModel(base_channels=96, use_pallas=False,
                                     dtype=jnp.float32)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    d1, f0s, x2 = _inputs(key, model.base_channels)

    ref = _xla_tail(model, variables, dtype)(d1, f0s, x2)
    chain = make_high_tail_chain(model, variables, dtype=dtype,
                                 interpret=True)
    got = depth_to_space(chain(d1, f0s, x2))
    assert got.shape == ref.shape
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < tol, f"max err {err} (dtype {dtype})"


def test_tail_chain_strip_invariance(key):
    """Different strip heights produce identical results."""
    model = HighIntensityDehazeModel(base_channels=96, use_pallas=False,
                                     dtype=jnp.float32)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    d1, f0s, x2 = _inputs(key, model.base_channels)
    outs = []
    for strip in (16, 8, 4):
        fn = make_high_tail_chain(model, variables, dtype=jnp.float32,
                                  interpret=True, strip=strip)
        outs.append(np.asarray(fn(d1, f0s, x2)))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-6)


def test_full_apply_with_tail_chain_matches_canonical(key):
    """make_high_s2d_apply(tail_chain=True) == canonical forward (f32)."""
    from adam_dehaze_tpu.ops.s2d import make_high_s2d_apply

    model = HighIntensityDehazeModel(base_channels=96, use_pallas=False,
                                     dtype=jnp.float32)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    want = model.apply(variables, x, train=False)
    fn = make_high_s2d_apply(model, variables, dtype=jnp.float32,
                             tail_chain=True, interpret=True)
    got = fn(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def _medium_xla_tail(model, variables, dtype):
    """The medium serving tail exactly as make_medium_s2d_apply composes
    it (ops/s2d.py:684-695)."""
    from adam_dehaze_tpu.ops.s2d import _fold_bn as fold_bn

    p = variables["params"]
    bs = variables["batch_stats"]
    c = model.base_channels
    kup, tup_ = fold_bn(p["UpBlock_1"]["ConvTranspose_0"]["kernel"],
                        p["UpBlock_1"]["BatchNorm_0"]["scale"],
                        p["UpBlock_1"]["BatchNorm_0"]["bias"],
                        bs["UpBlock_1"]["BatchNorm_0"]["mean"],
                        bs["UpBlock_1"]["BatchNorm_0"]["var"])
    s_up = (p["UpBlock_1"]["BatchNorm_0"]["scale"]
            / jnp.sqrt(bs["UpBlock_1"]["BatchNorm_0"]["var"] + 1e-5))
    tup = tup_ + s_up * p["UpBlock_1"]["ConvTranspose_0"]["bias"]
    kh1, th1 = _fold_convblock(p, bs, "ConvBlock_3")
    kh2, th2 = _fold_convblock(p, bs, "ConvBlock_4")
    kout, tout = p["Conv_0"]["kernel"], p["Conv_0"]["bias"]
    kh1s = s2d_conv_kernel(kh1).astype(dtype)
    kh2s = s2d_conv_kernel(kh2).astype(dtype)
    kouts = s2d_conv_kernel(kout).astype(dtype)

    def tail(d1, f0s, x2):
        d1 = d1.astype(dtype)
        f0s = f0s.astype(dtype)
        x2 = x2.astype(dtype)
        d2 = s2d_up4(d1, kup.astype(dtype), shift=tup, relu=True)
        d2 = _s2d_residual(d2, p, bs, "ResidualBlock_7", c, dtype)
        d2 = s2d_concat(d2, f0s, c, c)
        h = s2d_conv(d2, kh1s, c, k=3, shift=th1, relu=True)
        h = s2d_conv(h, kh2s, c // 2, k=3, shift=th2, relu=True)
        res = s2d_conv(h, kouts, 3, k=3, shift=tout)
        res = jnp.tanh(res)
        out = jnp.clip(x2 + res, 0.0, 1.0)
        return depth_to_space(out).astype(jnp.float32)

    return tail


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 3e-2)])
def test_medium_tail_chain_matches_xla_tail(key, dtype, tol):
    model = MediumIntensityDehazeModel(base_channels=64, use_pallas=False,
                                       dtype=jnp.float32)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    d1, f0s, x2 = _inputs(key, model.base_channels)

    ref = _medium_xla_tail(model, variables, dtype)(d1, f0s, x2)
    chain = make_medium_tail_chain(model, variables, dtype=dtype,
                                   interpret=True)
    got = depth_to_space(chain(d1, f0s, x2))
    assert got.shape == ref.shape
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < tol, f"max err {err} (dtype {dtype})"


def test_medium_full_apply_with_tail_chain_matches_canonical(key):
    """make_medium_s2d_apply(tail_chain=True) == canonical forward (f32)."""
    from adam_dehaze_tpu.ops.s2d import make_medium_s2d_apply

    model = MediumIntensityDehazeModel(base_channels=64, use_pallas=False,
                                       dtype=jnp.float32)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    want = model.apply(variables, x, train=False)
    fn = make_medium_s2d_apply(model, variables, dtype=jnp.float32,
                               tail_chain=True, interpret=True)
    got = fn(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_full_apply_res_and_tail_chain_matches_canonical(key):
    """The autotuner's combined candidate: res_chain('e2b') + tail_chain
    in one serving apply (f32 interpret) == canonical forward."""
    from adam_dehaze_tpu.ops.s2d import make_high_s2d_apply

    model = HighIntensityDehazeModel(base_channels=96, use_pallas=False,
                                     dtype=jnp.float32)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    x = jax.random.uniform(key, (1, SIZE, SIZE, 3), jnp.float32)
    want = model.apply(variables, x, train=False)
    fn = make_high_s2d_apply(model, variables, dtype=jnp.float32,
                             res_chain=("e2b",), tail_chain=True,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
