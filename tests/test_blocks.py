import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.nn.blocks import (
    AttentionBlock,
    ConvBlock,
    ResidualBlock,
    UpBlock,
    resize_bilinear,
)


def test_convblock_shapes(key):
    x = jnp.ones((2, 16, 16, 3))
    m = ConvBlock(8, 3)
    vars_ = m.init(key, x)
    y = m.apply(vars_, x)
    assert y.shape == (2, 16, 16, 8)
    # Stride-2 downsample with k=4, p=1 halves spatial dims exactly.
    m2 = ConvBlock(8, 4, stride=2, padding=1)
    y2 = m2.apply(m2.init(key, x), x)
    assert y2.shape == (2, 8, 8, 8)
    # 7x7 init conv keeps size.
    m3 = ConvBlock(8, 7)
    assert m3.apply(m3.init(key, x), x).shape == (2, 16, 16, 8)


def test_upblock_doubles(key):
    x = jnp.ones((2, 8, 8, 16))
    m = UpBlock(8)
    y = m.apply(m.init(key, x), x)
    assert y.shape == (2, 16, 16, 8)


def test_residualblock(key):
    x = jax.random.normal(key, (2, 16, 16, 8))
    m = ResidualBlock(8)
    y = m.apply(m.init(key, x), x)
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0  # final ReLU


def test_batchnorm_train_updates_stats(key):
    x = jax.random.normal(key, (4, 8, 8, 3)) * 2 + 5
    m = ConvBlock(4, 3)
    vars_ = m.init(key, x)
    y, mutated = m.apply(vars_, x, True, mutable=["batch_stats"])
    before = vars_["batch_stats"]
    after = mutated["batch_stats"]
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), before, after)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0


def test_attention_block(key):
    x = jax.random.normal(key, (2, 16, 16, 32))
    m = AttentionBlock(32)
    vars_ = m.init(key, x)
    y = m.apply(vars_, x)
    assert y.shape == x.shape
    # Gating only attenuates: |y| <= |x| elementwise (sigmoid gates in (0,1)).
    assert float((jnp.abs(y) - jnp.abs(x)).max()) <= 1e-5


def test_resize_bilinear(key):
    x = jax.random.uniform(key, (1, 8, 8, 3))
    y = resize_bilinear(x, (16, 16))
    assert y.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(float(y.mean()), float(x.mean()), atol=0.05)
