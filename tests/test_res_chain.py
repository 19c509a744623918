"""Equivalence tests for the fused res/CBAM chain kernel
(ops/pallas/res_chain.py) against the canonical flax blocks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.nn.blocks import AttentionBlock, ResidualBlock
from adam_dehaze_tpu.ops.pallas.res_chain import make_res_attn_chain


def _build_segment(key, c, kinds, h=16, w=16, n=2):
    """Init a [kind...] stack and return (x, canonical_fn, layer_specs)."""
    x = jax.random.uniform(key, (n, h, w, c), jnp.float32)
    keys = jax.random.split(key, len(kinds) + 1)
    mods, specs = [], []
    cur = x
    for i, kind in enumerate(kinds):
        if kind == "res":
            m = ResidualBlock(c)
            vs = m.init(keys[i], cur, train=False)
            specs.append(("res", vs["params"], vs["batch_stats"]))
        else:
            m = AttentionBlock(c)
            vs = m.init(keys[i], cur, train=False)
            specs.append(("attn", vs["params"], None))
        mods.append((m, vs))
        cur = m.apply(vs, cur, train=False)

    def canonical(xx):
        for m, vs in mods:
            xx = m.apply(vs, xx, train=False)
        return xx

    return x, canonical, specs


@pytest.mark.parametrize("kinds", [
    ("res",),
    ("res", "res"),
    ("res", "attn"),
    ("res", "res", "attn", "res", "attn"),
])
def test_chain_matches_canonical(kinds):
    # Post-ReLU input contract (uniform >= 0 satisfies it).
    x, canonical, specs = _build_segment(jax.random.PRNGKey(0), 128, kinds)
    fn = make_res_attn_chain(specs, c=128, dtype=jnp.float32, interpret=True)
    y = fn(x)
    y_ref = canonical(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


def test_chain_non_square_and_strip_fallback():
    # h=24 falls through the strip ladder to 8; w=40 exercises the
    # right-alignment padding columns.
    x, canonical, specs = _build_segment(
        jax.random.PRNGKey(1), 128, ("res", "attn"), h=24, w=40, n=1)
    fn = make_res_attn_chain(specs, c=128, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(fn(x)),
                               np.asarray(canonical(x)), atol=2e-5)


def test_high_branch_chain_wiring():
    """Full high-branch serving path with all three fused segments (tiny
    channels keep interpret mode tractable on CPU)."""
    from adam_dehaze_tpu.models.branches import HighIntensityDehazeModel
    from adam_dehaze_tpu.ops.s2d import make_high_s2d_apply
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3),
                           jnp.float32)
    m = HighIntensityDehazeModel(base_channels=8)
    vs = m.init(jax.random.PRNGKey(4), x, train=False)
    f = make_high_s2d_apply(m, vs, dtype=jnp.float32, res_chain=True,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(f(x)),
                               np.asarray(m.apply(vs, x, train=False)),
                               atol=1e-5)


def test_medium_branch_chain_wiring():
    from adam_dehaze_tpu.models.branches import MediumIntensityDehazeModel
    from adam_dehaze_tpu.ops.s2d import make_medium_chain_apply
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 16, 16, 3),
                           jnp.float32)
    m = MediumIntensityDehazeModel(base_channels=8)
    vs = m.init(jax.random.PRNGKey(6), x, train=False)
    f = make_medium_chain_apply(m, vs, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(f(x)),
                               np.asarray(m.apply(vs, x, train=False)),
                               atol=1e-5)


def test_chain_c256():
    # A wider-lane segment (covers the medium branch's 4c stages).
    x, canonical, specs = _build_segment(
        jax.random.PRNGKey(2), 256, ("res", "attn"), h=8, w=8, n=1)
    fn = make_res_attn_chain(specs, c=256, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(fn(x)),
                               np.asarray(canonical(x)), atol=2e-5)
