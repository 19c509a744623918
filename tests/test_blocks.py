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


def test_upblock_subpixel_equals_convtranspose(key):
    """The sub-pixel rewrite of ConvTranspose(4,4,s2,p1) is numerically
    identical to the literal flax lowering: same param tree, same forward
    (eval AND train/BN-stats), same gradients."""
    from adam_dehaze_tpu.nn.blocks import UpBlock

    x = jax.random.uniform(key, (2, 9, 11, 5), jnp.float32)
    ref = UpBlock(7, subpixel=False)
    fast = UpBlock(7, subpixel=True)
    vref = ref.init(key, x, False)
    assert (jax.tree_util.tree_structure(vref)
            == jax.tree_util.tree_structure(fast.init(key, x, False)))

    y_ref = ref.apply(vref, x, False)
    y_fast = fast.apply(vref, x, False)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fast),
                               atol=1e-5)

    yt_ref, m_ref = ref.apply(vref, x, True, mutable=["batch_stats"])
    yt_fast, m_fast = fast.apply(vref, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yt_ref), np.asarray(yt_fast),
                               atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(m_ref),
                    jax.tree_util.tree_leaves(m_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    g_ref = jax.grad(lambda v: (ref.apply(v, x, False) ** 2).sum())(vref)
    g_fast = jax.grad(lambda v: (fast.apply(v, x, False) ** 2).sum())(vref)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
