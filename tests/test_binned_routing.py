import jax
import pytest
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.models.branches import LightweightDehazeModel
from adam_dehaze_tpu.models.routing import (
    BinnedAdaptiveEngine,
    make_adaptive_infer,
    make_device_binned_infer,
)


def _setup(key, batch=7):
    models = {
        "low": LightweightDehazeModel(base_channels=4, n_blocks=1),
        "medium": LightweightDehazeModel(base_channels=6, n_blocks=1),
        "high": LightweightDehazeModel(base_channels=8, n_blocks=1),
    }
    x = jax.random.uniform(key, (batch, 16, 16, 3))
    variables = {n: m.init(jax.random.PRNGKey(i), x)
                 for i, (n, m) in enumerate(models.items())}
    applies = [
        (lambda v, m: (lambda img: m.apply(v, img)))(variables[n], models[n])
        for n in ("low", "medium", "high")
    ]

    def classifier(img):
        b = img.mean(axis=(1, 2, 3))
        # Deterministic pseudo-class from content, spread over all 3 classes.
        cls = jnp.floor(b * 1e4).astype(jnp.int32) % 3
        return jax.nn.one_hot(cls, 3) * 10.0, None

    return classifier, applies, x


@pytest.mark.slow
def test_binned_equals_select(key):
    classifier, applies, x = _setup(key)
    engine = BinnedAdaptiveEngine(classifier, applies, buckets=(1, 2, 4, 8))
    y_binned, intensity = engine(x)
    select = jax.jit(make_adaptive_infer(classifier, applies, "select"))
    y_sel, i_sel = select(x)
    np.testing.assert_array_equal(intensity, np.asarray(i_sel))
    assert len(np.unique(intensity)) >= 2  # the test actually exercises bins
    np.testing.assert_allclose(np.asarray(y_binned), np.asarray(y_sel),
                               rtol=1e-5, atol=1e-6)


def test_binned_single_class(key):
    classifier, applies, x = _setup(key, batch=3)

    def all_high(img):
        n = img.shape[0]
        return jnp.tile(jnp.array([[0.0, 0.0, 10.0]]), (n, 1)), None

    engine = BinnedAdaptiveEngine(all_high, applies, buckets=(1, 2, 4))
    y, intensity = engine(x)
    assert (intensity == 2).all()
    want = applies[2](x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_run_stream_matches_call(key):
    """Pipelined streaming serving == per-batch calls (same binning, same
    outputs), for both predicted and oracle labels."""
    classifier, applies, x = _setup(key, batch=6)
    engine = BinnedAdaptiveEngine(classifier, applies, buckets=(1, 2, 4))
    batches = [x[:3], x[3:], x[1:4]]
    direct = [engine(b) for b in batches]
    streamed = list(engine.run_stream(batches))
    assert len(streamed) == len(direct)
    for (yd, idir), (ys, istr) in zip(direct, streamed):
        np.testing.assert_array_equal(idir, istr)
        np.testing.assert_allclose(np.asarray(yd), np.asarray(ys), atol=1e-6)

    oracle = [np.array([0, 1, 2]), np.array([2, 2, 2]), np.array([1, 0, 1])]
    direct_o = [engine(b, intensity=i) for b, i in zip(batches, oracle)]
    streamed_o = list(engine.run_stream(batches, intensities=oracle))
    for (yd, _), (ys, lab), want in zip(direct_o, streamed_o, oracle):
        np.testing.assert_array_equal(lab, want)
        np.testing.assert_allclose(np.asarray(yd), np.asarray(ys), atol=1e-6)

@pytest.mark.parametrize("batch,chunk", [(7, 2), (12, 4), (3, 8), (9, 3)])
def test_device_binned_equals_select(key, batch, chunk):
    """The single-program on-device binning == hard one-hot select, for
    mixed-class traffic, across batch/chunk shapes (incl. batch < chunk and
    non-multiple batches)."""
    classifier, applies, x = _setup(key, batch=batch)
    fn = jax.jit(make_device_binned_infer(classifier, applies, chunk=chunk))
    y, intensity, _ = fn(x)
    select = jax.jit(make_adaptive_infer(classifier, applies, "select"))
    y_sel, i_sel = select(x)
    np.testing.assert_array_equal(np.asarray(intensity), np.asarray(i_sel))
    if batch >= 7:
        assert len(np.unique(np.asarray(intensity))) >= 2
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_sel),
                               rtol=1e-5, atol=1e-6)


def test_device_binned_single_class(key):
    """All-one-class traffic: every chunk takes the same switch arm; pad
    chunks must not corrupt any real row."""
    classifier, applies, x = _setup(key, batch=5)

    def all_high(img):
        n = img.shape[0]
        return jnp.tile(jnp.array([[0.0, 0.0, 10.0]]), (n, 1)), None

    fn = jax.jit(make_device_binned_infer(all_high, applies, chunk=2))
    y, intensity, _ = fn(x)
    assert (np.asarray(intensity) == 2).all()
    np.testing.assert_allclose(np.asarray(y), np.asarray(applies[2](x)),
                               rtol=1e-5, atol=1e-6)


def test_device_binned_oracle_override(key):
    """Given labels override the classifier's argmax (oracle-routed eval),
    matching the host engine's override semantics."""
    classifier, applies, x = _setup(key, batch=6)
    oracle = jnp.array([2, 2, 0, 1, 2, 0])
    fn = jax.jit(make_device_binned_infer(classifier, applies, chunk=2))
    y, intensity, logits = fn(x, oracle)
    np.testing.assert_array_equal(np.asarray(intensity), np.asarray(oracle))
    assert logits.shape == (6, 3)
    host = BinnedAdaptiveEngine(classifier, applies, buckets=(2, 4))
    y_host, _ = host(x, intensity=np.asarray(oracle))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_host),
                               rtol=1e-5, atol=1e-6)


def test_sharded_binned_matches_select(key):
    """Device-binned engine under shard_map on an 8-device data mesh: per-
    device local binning routes every image through its argmax branch —
    exactly the hard-select semantics, zero collectives added."""
    from adam_dehaze_tpu.models.routing import make_sharded_binned_infer
    from adam_dehaze_tpu.parallel.mesh import make_mesh

    classifier, applies, x = _setup(key, batch=16)
    mesh = make_mesh({"data": 8, "spatial": 1, "model": 1})
    mesh = jax.sharding.Mesh(mesh.devices.reshape(8), ("data",))
    fn = make_sharded_binned_infer(classifier, applies, mesh, chunk=2)
    y, intensity, logits = fn(x)
    select = jax.jit(make_adaptive_infer(classifier, applies, "select"))
    y_sel, i_sel = select(x)
    np.testing.assert_array_equal(np.asarray(intensity), np.asarray(i_sel))
    assert len(np.unique(np.asarray(intensity))) >= 2
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_sel),
                               rtol=1e-5, atol=1e-6)
    assert logits.shape == (16, 3)


def test_sharded_binned_with_s2d_applies(key):
    """The sharded device-binned engine composed with the s2d serving
    applies (ops/s2d.py) under shard_map on an 8-device mesh still matches
    hard-select routing — the s2d pure functions shard transparently."""
    from adam_dehaze_tpu.models.routing import make_sharded_binned_infer
    from adam_dehaze_tpu.ops.s2d import make_serving_apply
    from adam_dehaze_tpu.parallel.mesh import make_mesh

    models = {
        "low": LightweightDehazeModel(base_channels=4, n_blocks=1,
                                      dtype=jnp.float32),
        "medium": LightweightDehazeModel(base_channels=6, n_blocks=1,
                                         dtype=jnp.float32),
        "high": LightweightDehazeModel(base_channels=8, n_blocks=1,
                                       dtype=jnp.float32),
    }
    x = jax.random.uniform(key, (16, 16, 16, 3))
    variables = {n: m.init(jax.random.PRNGKey(i), x, False)
                 for i, (n, m) in enumerate(models.items())}
    applies = [make_serving_apply(models[n], variables[n],
                                  dtype=jnp.float32)
               for n in ("low", "medium", "high")]

    def classifier(img):
        b = img.mean(axis=(1, 2, 3))
        cls = jnp.floor(b * 1e4).astype(jnp.int32) % 3
        return jax.nn.one_hot(cls, 3) * 10.0, None

    mesh = make_mesh({"data": 8, "spatial": 1, "model": 1})
    mesh = jax.sharding.Mesh(mesh.devices.reshape(8), ("data",))
    fn = make_sharded_binned_infer(classifier, applies, mesh, chunk=2)
    y, intensity, logits = fn(x)
    select = jax.jit(make_adaptive_infer(classifier, applies, "select"))
    y_sel, i_sel = select(x)
    np.testing.assert_array_equal(np.asarray(intensity), np.asarray(i_sel))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_sel),
                               rtol=1e-5, atol=1e-6)


def test_run_queued_ordered_traffic(key):
    """Class-clumped batches: full same-class buckets, fidelity outputs,
    zero pad waste before the flush."""
    classifier, applies, _ = _setup(key)

    def clumped(img):
        # batch index encoded in the mean by construction below
        b = jnp.round(img.mean(axis=(1, 2, 3)) * 100).astype(jnp.int32)
        return jax.nn.one_hot(b % 3, 3) * 10.0, None

    engine = BinnedAdaptiveEngine(clumped, applies, buckets=(1, 2, 4))
    # 3 batches of 5, each entirely one class (mean ~= cls/100)
    batches = [jnp.full((5, 16, 16, 3), cls / 100.0) for cls in range(3)]
    got = list(engine.run_queued(batches, queue_bucket=4))
    # per class: one full bucket of 4 + one flushed remainder of 1
    sizes = {}
    for out, gidx, cls in got:
        assert out.shape[0] == gidx.size
        sizes.setdefault(cls, []).append(gidx.size)
    assert sizes == {0: [4, 1], 1: [4, 1], 2: [4, 1]}
    # every global index served exactly once
    all_idx = np.concatenate([g for _, g, _ in got])
    np.testing.assert_array_equal(np.sort(all_idx), np.arange(15))
    # fidelity: outputs equal the predicted branch's direct apply
    xs = jnp.concatenate(batches)
    for out, gidx, cls in got:
        want = applies[cls](xs[jnp.asarray(gidx)])
        np.testing.assert_allclose(out, np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_run_queued_mixed_traffic_matches_fidelity(key):
    """Mixed batches, cross-batch composition: same per-image results as
    fidelity mode, all indices covered."""
    classifier, applies, _ = _setup(key)
    engine = BinnedAdaptiveEngine(classifier, applies, buckets=(1, 2, 4, 8))
    k1, k2, k3 = jax.random.split(key, 3)
    batches = [jax.random.uniform(kk, (6, 16, 16, 3)) for kk in (k1, k2, k3)]
    xs = jnp.concatenate(batches)
    labels = np.asarray(engine._classify(xs))
    got = list(engine.run_queued(batches, queue_bucket=4))
    all_idx = np.concatenate([g for _, g, _ in got])
    np.testing.assert_array_equal(np.sort(all_idx), np.arange(18))
    y_fid = np.zeros((18, 16, 16, 3), np.float32)
    for out, gidx, cls in got:
        assert (labels[gidx] == cls).all()
        y_fid[gidx] = out
    want, _ = engine(xs, intensity=labels)
    np.testing.assert_allclose(y_fid, np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_run_queued_no_flush_holds_tails(key):
    classifier, applies, _ = _setup(key)
    engine = BinnedAdaptiveEngine(classifier, applies, buckets=(1, 2, 4))

    def all_high(img):
        n = img.shape[0]
        return jnp.tile(jnp.array([[0.0, 0.0, 10.0]]), (n, 1)), None

    engine = BinnedAdaptiveEngine(all_high, applies, buckets=(1, 2, 4))
    batches = [jax.random.uniform(key, (3, 16, 16, 3))]
    got = list(engine.run_queued(batches, queue_bucket=4, flush=False))
    assert got == []  # 3 < 4: queued, never dispatched
    got = list(engine.run_queued(batches, queue_bucket=4, flush=True))
    assert len(got) == 1 and got[0][2] == 2 and got[0][1].size == 3


def test_run_queued_bucket_beyond_ladder_flushes(key):
    """queue_bucket larger than buckets[-1]: the flush chunks remainders at
    the ladder's largest program instead of broadcasting a negative pad."""
    classifier, applies, _ = _setup(key)

    def all_high(img):
        n = img.shape[0]
        return jnp.tile(jnp.array([[0.0, 0.0, 10.0]]), (n, 1)), None

    engine = BinnedAdaptiveEngine(all_high, applies, buckets=(1, 2, 4))
    batches = [jax.random.uniform(key, (5, 16, 16, 3))]
    got = list(engine.run_queued(batches, queue_bucket=8))
    # 5 < 8: nothing drains; flush serves 4 + 1 through the ladder
    assert [g.size for _, g, _ in got] == [4, 1]
    all_idx = np.concatenate([g for _, g, _ in got])
    np.testing.assert_array_equal(np.sort(all_idx), np.arange(5))
    xs = batches[0]
    for out, gidx, cls in got:
        assert cls == 2
        want = applies[cls](xs[jnp.asarray(gidx)])
        np.testing.assert_allclose(out, np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_run_queued_intensities_override(key):
    """Given per-batch labels drive queue composition (the classifier's
    predictions are ignored), mirroring run_stream's intensities arg."""
    classifier, applies, _ = _setup(key)

    def all_low(img):
        n = img.shape[0]
        return jnp.tile(jnp.array([[10.0, 0.0, 0.0]]), (n, 1)), None

    engine = BinnedAdaptiveEngine(all_low, applies, buckets=(1, 2, 4))
    k1, k2 = jax.random.split(key)
    batches = [jax.random.uniform(k1, (4, 16, 16, 3)),
               jax.random.uniform(k2, (4, 16, 16, 3))]
    labels = [np.array([2, 2, 2, 2]), np.array([1, 1, 2, 2])]
    got = list(engine.run_queued(batches, queue_bucket=4,
                                 intensities=labels))
    by_cls = {}
    for out, gidx, cls in got:
        by_cls.setdefault(cls, []).append(gidx.size)
    # classifier says all-low, but the override routes 6 high + 2 medium
    assert 0 not in by_cls
    assert sorted(by_cls[2]) == [2, 4] and by_cls[1] == [2]
    xs = jnp.concatenate(batches)
    lab = np.concatenate(labels)
    for out, gidx, cls in got:
        assert (lab[gidx] == cls).all()
        want = applies[cls](xs[jnp.asarray(gidx)])
        np.testing.assert_allclose(out, np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_run_queued_max_wait_bounds_latency(key):
    """A rare class trickling 1 image/batch on majority traffic never fills
    its bucket; max_wait_batches=2 forces a padded dispatch within 2 further
    enqueues instead of waiting for the end-of-stream flush."""
    classifier, applies, _ = _setup(key)

    def one_high_rest_low(img):
        n = img.shape[0]
        logits = jnp.tile(jnp.array([[10.0, 0.0, 0.0]]), (n, 1))
        return logits.at[0].set(jnp.array([0.0, 0.0, 10.0])), None

    engine = BinnedAdaptiveEngine(one_high_rest_low, applies,
                                  buckets=(1, 2, 4))
    rng = np.random.default_rng(3)
    batches = [jnp.asarray(rng.uniform(size=(4, 16, 16, 3)).astype(np.float32))
               for _ in range(5)]
    got = list(engine.run_queued(batches, queue_bucket=4,
                                 max_wait_batches=2, flush=False))
    # low fills a 4-bucket per pair of batches (3+3 -> one full + 2 carried);
    # the high trickle (1/batch) must surface mid-stream via stale dispatch.
    high_yields = [(g, cls) for _, g, cls in got if cls == 2]
    assert high_yields, "stale high images never dispatched mid-stream"
    # Every high image that aged >= max_wait ticks is served even though
    # flush=False: batches 0..4 enqueue at ticks 1..5, stale-checking after
    # each enqueue, so the tick-1..3 trickles (globals 0, 4, 8) dispatch
    # mid-stream while the two youngest (globals 12, 16) are held.
    served_high = np.concatenate([g for g, _ in high_yields])
    assert set(served_high.tolist()) == {0, 4, 8}
    # fidelity on everything served
    xs = jnp.concatenate(batches)
    for out, gidx, cls in got:
        want = applies[cls](xs[jnp.asarray(gidx)])
        np.testing.assert_allclose(out, np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
    # exactly-once over the served subset
    all_idx = np.concatenate([g for _, g, _ in got])
    assert all_idx.size == np.unique(all_idx).size


def test_run_queued_max_wait_matches_fidelity_exactly_once(key):
    """max_wait with flush: same per-image results as fidelity mode, every
    index served exactly once (stale dispatch must not double-serve)."""
    classifier, applies, _ = _setup(key)
    engine = BinnedAdaptiveEngine(classifier, applies, buckets=(1, 2, 4, 8))
    k1, k2, k3, k4 = jax.random.split(key, 4)
    batches = [jax.random.uniform(kk, (5, 16, 16, 3))
               for kk in (k1, k2, k3, k4)]
    xs = jnp.concatenate(batches)
    labels = np.asarray(engine._classify(xs))
    got = list(engine.run_queued(batches, queue_bucket=8,
                                 max_wait_batches=1))
    all_idx = np.concatenate([g for _, g, _ in got])
    np.testing.assert_array_equal(np.sort(all_idx), np.arange(20))
    y = np.zeros((20, 16, 16, 3), np.float32)
    for out, gidx, cls in got:
        assert (labels[gidx] == cls).all()
        y[gidx] = out
    want, _ = engine(xs, intensity=labels)
    np.testing.assert_allclose(y, np.asarray(want), rtol=1e-5, atol=1e-6)


def test_engines_serve_every_image_exactly_once_randomized(key):
    """Invariant sweep across traffic patterns: every engine mode serves
    each image exactly once with finite outputs and in-range labels."""
    classifier, applies, _ = _setup(key)
    engine = BinnedAdaptiveEngine(classifier, applies, buckets=(1, 2, 4))
    rng = np.random.default_rng(7)
    for trial in range(4):
        sizes = rng.integers(1, 7, size=rng.integers(1, 4))
        batches = [jnp.asarray(rng.uniform(size=(s, 16, 16, 3))
                               .astype(np.float32)) for s in sizes]
        total = int(sizes.sum())
        # queued mode
        seen = np.zeros(total, np.int32)
        for out, gidx, cls in engine.run_queued(batches, queue_bucket=4):
            assert np.isfinite(out).all()
            assert 0 <= cls < 3
            seen[gidx] += 1
        np.testing.assert_array_equal(seen, 1)
        # batch modes on the concatenation
        xs = jnp.concatenate(batches)
        for spill in (False, True):
            out, labels = engine(xs, spill=spill)
            assert np.isfinite(np.asarray(out)).all()
            assert ((labels >= 0) & (labels < 3)).all()
