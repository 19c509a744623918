"""Deployment-time serving autotuner (adam_dehaze_tpu/serving_autotune.py).

On CPU the candidate set is {canonical, s2d} (Pallas chains are TPU-only
serving paths), which is enough to exercise the full tune -> pick ->
cache -> reuse cycle.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.models.branches import (
    LightweightDehazeModel,
    MediumIntensityDehazeModel,
)
from adam_dehaze_tpu.serving_autotune import (
    autotune,
    candidate_builders,
    load_cached,
    load_or_tune,
)

SIZE = 32
SHAPE = (2, SIZE, SIZE, 3)


@pytest.fixture(scope="module")
def low_model():
    model = LightweightDehazeModel(dtype=jnp.float32)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    return model, variables


def test_candidates_cpu(low_model):
    model, variables = low_model
    cands = candidate_builders(model, variables, jnp.float32)
    assert "canonical" in cands and "s2d" in cands
    # Pallas chains are never offered on CPU
    assert "chain" not in cands


def test_autotune_picks_a_working_apply(low_model):
    model, variables = low_model
    best, table, best_fn = autotune(model, variables, jnp.float32, SHAPE,
                                    iters=1, warm=1)
    assert best in table and table[best] is not None
    x = jax.random.uniform(jax.random.PRNGKey(1), SHAPE, jnp.float32)
    want = model.apply(variables, x, train=False)
    # the returned winner is the timed (already-jitted) fn
    np.testing.assert_allclose(np.asarray(best_fn(x)), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    fn = candidate_builders(model, variables, jnp.float32)[best]()
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_autotune_skips_broken_candidate(low_model):
    model, variables = low_model
    cands = candidate_builders(model, variables, jnp.float32)

    def broken():
        raise ValueError("lane alignment")

    cands = {"broken": broken, **cands}
    best, table, _fn = autotune(model, variables, jnp.float32, SHAPE,
                                iters=1, warm=1, candidates=cands)
    assert best != "broken"
    assert table["broken"] is None
    assert "ValueError" in table["broken_error"]


def test_load_or_tune_caches(low_model, tmp_path):
    model, variables = low_model
    cache = str(tmp_path / "autotune.json")
    fn1, rep1 = load_or_tune(model, variables, jnp.float32, SHAPE,
                             cache_path=cache, iters=1, warm=1)
    assert rep1["cached"] is False
    assert os.path.exists(cache)
    with open(cache) as f:
        stored = json.load(f)
    assert len(stored) == 1
    # second load: cache hit, no timing
    fn2, rep2 = load_or_tune(model, variables, jnp.float32, SHAPE,
                             cache_path=cache, iters=1, warm=1)
    assert rep2["cached"] is True
    assert rep2["best"] == rep1["best"]
    x = jax.random.uniform(jax.random.PRNGKey(1), SHAPE, jnp.float32)
    np.testing.assert_allclose(np.asarray(fn1(x)), np.asarray(fn2(x)),
                               rtol=1e-5, atol=1e-6)


def test_load_cached_read_only(low_model, tmp_path):
    """load_cached returns (None, None) on a miss without creating the
    cache, and the winner after a tune — never timing or writing itself."""
    model, variables = low_model
    cache = str(tmp_path / "autotune.json")
    fn, hit = load_cached(model, variables, jnp.float32, SHAPE, cache)
    assert fn is None and hit is None
    assert not os.path.exists(cache)
    _, rep = load_or_tune(model, variables, jnp.float32, SHAPE,
                          cache_path=cache, iters=1, warm=1)
    mtime = os.path.getmtime(cache)
    fn, hit = load_cached(model, variables, jnp.float32, SHAPE, cache)
    assert hit["best"] == rep["best"] and hit["cached"] is True
    assert os.path.getmtime(cache) == mtime
    x = jax.random.uniform(jax.random.PRNGKey(1), SHAPE, jnp.float32)
    want = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_cache_key_distinguishes_shape_and_dtype(low_model, tmp_path):
    model, variables = low_model
    cache = str(tmp_path / "autotune.json")
    load_or_tune(model, variables, jnp.float32, SHAPE,
                 cache_path=cache, iters=1, warm=1)
    load_or_tune(model, variables, jnp.float32, (1, SIZE, SIZE, 3),
                 cache_path=cache, iters=1, warm=1)
    with open(cache) as f:
        stored = json.load(f)
    assert len(stored) == 2


@pytest.mark.slow
def test_autotune_medium(tmp_path):
    model = MediumIntensityDehazeModel(base_channels=16, dtype=jnp.float32)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    fn, rep = load_or_tune(model, variables, jnp.float32, SHAPE,
                           cache_path=str(tmp_path / "c.json"),
                           iters=1, warm=1)
    x = jax.random.uniform(jax.random.PRNGKey(1), SHAPE, jnp.float32)
    want = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
