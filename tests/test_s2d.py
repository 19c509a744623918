"""Space-to-depth serving transform (ops/s2d.py): exactness vs the canonical
flax modules, and the serving/engine wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.ops.s2d import (
    depth_to_space,
    make_lightweight_s2d_apply,
    make_serving_apply,
    s2d_conv3x3,
    s2d_conv3x3_kernel,
    space_to_depth,
)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_s2d_roundtrip(key):
    x = jax.random.uniform(key, (2, 8, 12, 5))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


def test_s2d_conv_equals_conv3x3(key):
    """s2d(conv3x3_p1(x, W)) == s2d_conv(s2d(x), T(W)) exactly."""
    x = jax.random.uniform(key, (2, 16, 20, 5), jnp.float32)
    w = jax.random.normal(key, (3, 3, 5, 7), jnp.float32) * 0.2
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = depth_to_space(s2d_conv3x3(space_to_depth(x),
                                     s2d_conv3x3_kernel(w), 7))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_lightweight_s2d_apply_exact(key):
    """The full folded-BN s2d serving path reproduces the canonical
    eval-mode forward of the low branch."""
    from adam_dehaze_tpu.models.branches import LightweightDehazeModel

    m = LightweightDehazeModel(base_channels=32, n_blocks=3,
                               dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), jnp.float32)
    vs = m.init(key, x, False)
    # Perturb running stats so the BN fold is non-trivial.
    bs = jax.tree_util.tree_map(
        lambda a: a + jax.random.uniform(jax.random.PRNGKey(2), a.shape) * 0.3,
        vs["batch_stats"])
    vs = {"params": vs["params"], "batch_stats": bs}

    y_ref = m.apply(vs, x, False)
    y_fast = make_lightweight_s2d_apply(vs, dtype=jnp.float32)(x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fast),
                               atol=1e-5)


def test_make_serving_apply_dispatch(key):
    """Factory picks s2d for the lightweight low branch and the canonical
    apply for other models — outputs match the flax forward either way."""
    from adam_dehaze_tpu.models.branches import (
        LightweightDehazeModel,
        MediumIntensityDehazeModel,
    )

    x = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32)
    for cls in (LightweightDehazeModel, MediumIntensityDehazeModel):
        m = cls(dtype=jnp.float32)
        vs = m.init(key, x, False)
        fn = make_serving_apply(m, vs, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(m.apply(vs, x, False)),
                                   np.asarray(fn(x)), atol=1e-5)


def test_device_binned_with_s2d_applies(key):
    """The on-device binned engine with s2d serving applies matches the
    per-image branch forward (its no-op tail chunks never leak)."""
    from adam_dehaze_tpu.models.branches import LightweightDehazeModel
    from adam_dehaze_tpu.models.routing import make_device_binned_infer

    n = 10
    x = jax.random.uniform(key, (n, 16, 16, 3), jnp.float32)
    models = [LightweightDehazeModel(base_channels=8, n_blocks=1,
                                     dtype=jnp.float32) for _ in range(3)]
    varss = [m.init(jax.random.PRNGKey(i), x, False)
             for i, m in enumerate(models)]
    applies = [make_serving_apply(m, v, dtype=jnp.float32)
               for m, v in zip(models, varss)]

    def clf(img):  # deterministic synthetic logits
        s = jnp.mean(img, axis=(1, 2, 3))
        return jnp.stack([s, s * 2, 1.0 - s], axis=1), None

    infer = jax.jit(make_device_binned_infer(clf, applies, chunk=4))
    dehazed, intensity, _ = infer(x)
    for i in range(n):
        expect = applies[int(intensity[i])](x[i:i + 1])[0]
        np.testing.assert_allclose(np.asarray(dehazed[i]), np.asarray(expect),
                                   atol=1e-5)


@pytest.mark.parametrize("which", ["medium", "high"])
def test_medium_high_s2d_apply_exact(key, which):
    """The hybrid s2d serving paths (full-res stages in s2d, inner stages
    canonical) reproduce the eval-mode forward of the medium/high branches,
    including folded BN, s2d attention, and the s2d-emitting upsampler."""
    from adam_dehaze_tpu.models.branches import (
        HighIntensityDehazeModel,
        MediumIntensityDehazeModel,
    )
    from adam_dehaze_tpu.ops.s2d import (
        make_high_s2d_apply,
        make_medium_s2d_apply,
    )

    cls, mk = {
        "medium": (MediumIntensityDehazeModel, make_medium_s2d_apply),
        "high": (HighIntensityDehazeModel, make_high_s2d_apply),
    }[which]
    m = cls(dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    vs = m.init(key, x, False)
    bs = jax.tree_util.tree_map(
        lambda a: a + jax.random.uniform(jax.random.PRNGKey(2), a.shape) * 0.3,
        vs["batch_stats"])
    vs = {"params": vs["params"], "batch_stats": bs}
    y_ref = m.apply(vs, x, False)
    y_fast = mk(m, vs, dtype=jnp.float32)(x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fast),
                               atol=1e-5)


def test_general_s2d_primitives(key):
    """k=1/7 conv, k4s2 down, s2d-emitting up, and s2d attention vs their
    canonical counterparts."""
    import flax.linen as nn

    from adam_dehaze_tpu.nn.blocks import AttentionBlock
    from adam_dehaze_tpu.ops.s2d import (
        s2d_attention,
        s2d_conv,
        s2d_conv_kernel,
        s2d_down4,
        s2d_down4_kernel,
        s2d_up4,
    )

    x = jax.random.uniform(key, (2, 16, 20, 5), jnp.float32)
    for k in (1, 7):
        w = jax.random.normal(key, (k, k, 5, 6), jnp.float32) * 0.2
        p = (k - 1) // 2
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = depth_to_space(
            s2d_conv(space_to_depth(x), s2d_conv_kernel(w), 6, k=k))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)

    w4 = jax.random.normal(key, (4, 4, 5, 6), jnp.float32) * 0.2
    ref = jax.lax.conv_general_dilated(
        x, w4, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = s2d_down4(space_to_depth(x), s2d_down4_kernel(w4))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)

    ct = nn.ConvTranspose(6, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                          use_bias=False)
    wct = jax.random.normal(key, (4, 4, 5, 6), jnp.float32) * 0.2
    ref = ct.apply({"params": {"kernel": wct}}, x)
    got = depth_to_space(s2d_up4(x, wct))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)

    xa = jax.random.uniform(key, (2, 16, 20, 16), jnp.float32)
    attn = AttentionBlock(16)
    va = attn.init(key, xa)
    ref = attn.apply(va, xa)
    got = depth_to_space(
        s2d_attention(space_to_depth(xa), va["params"], 16,
                      dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_stem7_kernel_equals_stride2_conv(key):
    """s2d_stem7(s2d(x), T(W)) == conv7x7 stride-2 pad-3 exactly (the
    classifier stem algebra, ops/s2d.py:s2d_stem7_kernel)."""
    from adam_dehaze_tpu.ops.s2d import s2d_stem7, s2d_stem7_kernel

    x = jax.random.uniform(key, (2, 32, 40, 3), jnp.float32)
    w = jax.random.normal(key, (7, 7, 3, 6), jnp.float32) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = s2d_stem7(space_to_depth(x), s2d_stem7_kernel(w))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_classifier_s2d_apply_exact(key):
    """The s2d-stem classifier serving path reproduces the canonical
    eval-mode (logits, features) of FogIntensityClassifier."""
    from adam_dehaze_tpu.models.classifier import FogIntensityClassifier
    from adam_dehaze_tpu.ops.s2d import make_classifier_serving_apply

    clf = FogIntensityClassifier(model_name="resnet18")
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    vs = clf.init({"params": key, "dropout": jax.random.PRNGKey(2)}, x)
    bs = jax.tree_util.tree_map(
        lambda a: a + jax.random.uniform(jax.random.PRNGKey(3), a.shape) * 0.2,
        vs["batch_stats"])
    vs = {"params": vs["params"], "batch_stats": bs}

    logits_ref, feats_ref = clf.apply(vs, x)
    fn = make_classifier_serving_apply(clf, vs, dtype=jnp.float32)
    logits, feats = fn(x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats_ref),
                               atol=1e-4)

    # Non-resnet backbones fall back to the canonical apply.
    clf2 = FogIntensityClassifier(model_name="mobilenet_v2")
    v2 = clf2.init({"params": key, "dropout": jax.random.PRNGKey(2)}, x)
    fn2 = make_classifier_serving_apply(clf2, v2, dtype=jnp.float32)
    l2, f2 = fn2(x)
    l2r, f2r = clf2.apply(v2, x)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l2r), atol=1e-6)


def test_lightweight_chain_apply_exact(key):
    """The fused Pallas chain (interpret mode) reproduces the canonical
    eval-mode forward of the low branch (ops/pallas/s2d_chain.py)."""
    from adam_dehaze_tpu.models.branches import LightweightDehazeModel
    from adam_dehaze_tpu.ops.pallas.s2d_chain import make_lightweight_chain_apply

    m = LightweightDehazeModel(base_channels=32, n_blocks=3,
                               dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), jnp.float32)
    vs = m.init(key, x, False)
    bs = jax.tree_util.tree_map(
        lambda a: a + jax.random.uniform(jax.random.PRNGKey(2), a.shape) * 0.3,
        vs["batch_stats"])
    vs = {"params": vs["params"], "batch_stats": bs}

    y_ref = m.apply(vs, x, False)
    y_fast = make_lightweight_chain_apply(vs, dtype=jnp.float32,
                                          interpret=True)(x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fast),
                               atol=1e-5)

    # Non-square, non-strip-divisible size: h2=24 falls through the strip
    # ladder to 8, w2=40 exercises the stride round-up padding columns.
    xb = jax.random.uniform(jax.random.PRNGKey(3), (1, 48, 80, 3),
                            jnp.float32)
    yb_ref = m.apply(vs, xb, False)
    yb = make_lightweight_chain_apply(vs, dtype=jnp.float32,
                                      interpret=True)(xb)
    np.testing.assert_allclose(np.asarray(yb_ref), np.asarray(yb),
                               atol=1e-5)
