"""Cost-model bucket decomposition (models/routing.py:plan_chunks).

The fidelity trained-routing delta in BENCH_r03 (~1.0 ms/image) was pad
waste: bucket_for saturates a skewed bin (18 images -> one 32-padded
program, 14 wasted branch rows). plan_chunks decomposes against a
pad-rows-vs-programs cost model instead; these tests pin the planner and
prove the engine serves skewed traffic through the planned programs with
unchanged outputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.models.routing import (
    BinnedAdaptiveEngine,
    bucket_for,
    plan_chunks,
)

LADDER = (1, 2, 4, 8, 16, 32)


def test_plan_covers_and_uses_ladder():
    for n in range(0, 130):
        plan = plan_chunks(n, LADDER)
        assert sum(plan) >= n
        assert all(b in LADDER for b in plan)
        # no droppable program: every entry consumes >=1 row largest-first
        if n:
            assert sum(plan) - min(plan) < n


def test_plan_splits_heavy_pad():
    # 18 -> 16+2 (0 pad, 2 programs) beats one 32-bucket (14 pad rows).
    assert plan_chunks(18, LADDER, 2.0) == (16, 2)
    # 14 -> one 16-bucket (2 pad rows) beats 8+4+2 (3 programs).
    assert plan_chunks(14, LADDER, 2.0) == (16,)


def test_plan_overhead_tradeoff_direction():
    # Cheap rows (large overhead_rows): merge into fewer, padded programs.
    assert len(plan_chunks(24, LADDER, 10.0)) <= len(
        plan_chunks(24, LADDER, 0.1))
    # Expensive rows (small overhead_rows): zero pad whenever possible.
    assert sum(plan_chunks(31, LADDER, 0.1)) == 31


def test_plan_never_worse_than_bucket_for():
    """Pad rows under the plan never exceed the old saturate-and-round
    behavior, for any n and the default overhead."""
    for n in range(1, 200):
        old_pad, pos = 0, 0
        while pos < n:
            take = min(32, n - pos)
            old_pad += bucket_for(take, LADDER) - take
            pos += take
        new_pad = sum(plan_chunks(n, LADDER, 2.0)) - n
        assert new_pad <= old_pad, (n, new_pad, old_pad)


def _const_branch(scale):
    return lambda img: img * scale


def _classifier_from_labels(labels):
    lab = jnp.asarray(labels)

    def classifier(img):
        return jax.nn.one_hot(lab[: img.shape[0]], 3) * 10.0, None

    return classifier


def test_skewed_bin_dispatches_planned_programs(key):
    """18/14/16 labels: class-0 runs 16+2, class-1 one 16, class-2 one 16
    — and the scattered output is exact."""
    labels = np.array([0] * 18 + [1] * 14 + [2] * 16)
    x = jax.random.uniform(key, (48, 8, 8, 3))
    eng = BinnedAdaptiveEngine(
        _classifier_from_labels(labels),
        [_const_branch(s) for s in (2.0, 3.0, 5.0)],
        buckets=LADDER,
    )
    calls = []
    orig = list(eng._bucket_steps)

    def wrap(cls, step):
        def counted(px, idx, out):
            calls.append((cls, int(idx.shape[0])))
            return step(px, idx, out)

        return counted

    eng._bucket_steps = [wrap(c, s) for c, s in enumerate(orig)]
    y, intensity = eng(x)
    np.testing.assert_array_equal(np.asarray(intensity), labels)
    sizes = {c: sorted((b for cc, b in calls if cc == c), reverse=True)
             for c in range(3)}
    assert sizes[0] == [16, 2]
    assert sizes[1] == [16]
    assert sizes[2] == [16]
    want = np.concatenate([
        np.asarray(x[:18]) * 2.0,
        np.asarray(x[18:32]) * 3.0,
        np.asarray(x[32:]) * 5.0,
    ])
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-6, atol=1e-6)


def test_queued_flush_remainder_uses_plan(key):
    """run_queued's end-of-stream flush serves an 18-image remainder as a
    pad-free 16-bucket + a 2-bucket (plan_chunks), not one 32-padded
    program (old bucket_for saturation)."""
    labels = np.zeros(18, np.int64)
    x = jax.random.uniform(key, (18, 8, 8, 3))
    eng = BinnedAdaptiveEngine(
        _classifier_from_labels(labels),
        [_const_branch(s) for s in (2.0, 3.0, 5.0)],
        buckets=LADDER,
    )
    program_sizes = []
    orig = list(eng.branch_applies)

    def wrap(fn):
        def counted(xq):
            program_sizes.append(int(xq.shape[0]))
            return fn(xq)

        return counted

    eng.branch_applies = [wrap(f) for f in orig]
    got = {}
    for out, gidx, cls in eng.run_queued([x], intensities=[labels]):
        assert cls == 0
        for i, g in enumerate(gidx):
            got[int(g)] = np.asarray(out[i])
    assert program_sizes == [16, 2]
    assert sorted(got) == list(range(18))
    for g, y in got.items():
        np.testing.assert_allclose(y, np.asarray(x[g]) * 2.0,
                                   rtol=1e-6, atol=1e-6)


def test_set_chunk_costs_row_units():
    eng = BinnedAdaptiveEngine(
        _classifier_from_labels([0]),
        [_const_branch(s) for s in (2.0, 3.0, 5.0)],
        buckets=LADDER,
    )
    # 0.35 ms dispatch vs {0.28, 1.6, 3.7} ms rows -> {1.25, 0.22, 0.09}
    eng.set_chunk_costs(0.35, [0.28, 1.6, 3.7])
    assert eng.program_overhead_rows[0] == pytest.approx(1.25)
    assert eng.program_overhead_rows[2] == pytest.approx(0.0946, abs=1e-3)
    # high-branch rows are expensive: 14 now splits pad-free
    assert sum(plan_chunks(14, LADDER, eng.program_overhead_rows[2])) == 14


def test_empty_ladder_raises():
    """An empty bucket ladder must raise, not hang (ADVICE r3: cost[r]=inf
    left the reconstruction loop spinning forever)."""
    import pytest

    with pytest.raises(ValueError):
        plan_chunks(5, ())
