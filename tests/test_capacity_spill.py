"""Capacity-spill routing policy (BinnedAdaptiveEngine.plan_capacity_spill).

Skewed real-classifier traffic must never pay an extra padded bucket
program: overflow images beyond a class's bucket capacity are served by a
neighboring branch's free pad slots (MoE capacity-factor style). Fidelity
mode (spill=False) keeps the exact per-class dispatch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.models.routing import BinnedAdaptiveEngine


def _const_applies():
    """Branch i multiplies by (i + 1): outputs identify the serving branch."""
    return [(lambda img, k=i + 1.0: img * k) for i in range(3)]


def _classifier_from_labels(labels):
    labels = jnp.asarray(labels)

    def classifier(img):
        return jax.nn.one_hot(labels[: img.shape[0]], 3) * 10.0, None

    return classifier


def _branch_of(y, x):
    """Recover which constant-branch produced each output row."""
    ratio = np.asarray(y).reshape(y.shape[0], -1)[:, 0] / (
        np.asarray(x).reshape(x.shape[0], -1)[:, 0])
    return np.rint(ratio).astype(int) - 1


def test_plan_balanced_is_identity():
    eng = BinnedAdaptiveEngine(_classifier_from_labels([0] * 3),
                               _const_applies(), buckets=(4,))
    labels = np.repeat(np.arange(3), 4)
    np.testing.assert_array_equal(eng.plan_capacity_spill(labels), labels)


def test_plan_spills_overflow_to_free_class():
    eng = BinnedAdaptiveEngine(_classifier_from_labels([0] * 3),
                               _const_applies(), buckets=(4,))
    # counts (5, 3, 4) with cap 4: one low-class image must move; the only
    # free class is medium (stronger neighbor preferred anyway).
    labels = np.array([0, 0, 0, 0, 0, 1, 1, 1, 2, 2, 2, 2])
    eff = eng.plan_capacity_spill(labels)
    counts = np.bincount(eff, minlength=3)
    np.testing.assert_array_equal(counts, [4, 4, 4])
    # exactly one image changed, from class 0 to class 1
    changed = np.nonzero(eff != labels)[0]
    assert changed.size == 1
    assert labels[changed[0]] == 0 and eff[changed[0]] == 1


def test_plan_prefers_stronger_branch():
    eng = BinnedAdaptiveEngine(_classifier_from_labels([0] * 3),
                               _const_applies(), buckets=(4,))
    # medium overflows; both low and high have a free slot -> prefer HIGH
    # (the stronger dehazer degrades less on lighter fog).
    labels = np.array([0, 0, 0, 1, 1, 1, 1, 1, 2, 2, 2])
    eff = eng.plan_capacity_spill(labels)
    changed = np.nonzero(eff != labels)[0]
    assert changed.size == 1
    assert labels[changed[0]] == 1 and eff[changed[0]] == 2


def test_plan_margin_picks_least_committed():
    eng = BinnedAdaptiveEngine(_classifier_from_labels([0] * 3),
                               _const_applies(), buckets=(2,))
    labels = np.array([0, 0, 0, 1, 2, 2])  # low overflows by 1, medium free
    logits = np.full((6, 3), -10.0)
    logits[np.arange(6), labels] = 10.0
    # image 1 is nearly medium; it must be the one spilled
    logits[1, 1] = 9.5
    eff = eng.plan_capacity_spill(labels, logits)
    changed = np.nonzero(eff != labels)[0]
    np.testing.assert_array_equal(changed, [1])
    assert eff[1] == 1


def test_plan_cap_rounds_to_bucket():
    eng = BinnedAdaptiveEngine(_classifier_from_labels([0] * 3),
                               _const_applies(), buckets=(2, 4))
    # n=10 -> per-class ceil 4 -> cap 4 (already a bucket); counts (6,2,2):
    # two lows spill, both to the nearest stronger class (medium has room).
    labels = np.array([0] * 6 + [1] * 2 + [2] * 2)
    eff = eng.plan_capacity_spill(labels)
    counts = np.bincount(eff, minlength=3)
    assert counts.max() <= 4
    assert (eff[labels == 0] == 1).sum() == 2


def test_call_spill_serves_with_neighbor_and_reports_predictions(key):
    labels = np.array([0, 0, 0, 0, 0, 1, 1, 1, 2, 2, 2, 2])
    eng = BinnedAdaptiveEngine(_classifier_from_labels(labels),
                               _const_applies(), buckets=(4,))
    x = jax.random.uniform(key, (12, 8, 8, 3)) + 0.5
    y, intensity = eng(x, spill=True)
    # returned labels are the classifier's PREDICTIONS, not the spill plan
    np.testing.assert_array_equal(intensity, labels)
    served = _branch_of(y, x)
    counts = np.bincount(served, minlength=3)
    np.testing.assert_array_equal(counts, [4, 4, 4])
    # non-overflow classes untouched; the spilled image went to medium
    np.testing.assert_array_equal(served[5:], labels[5:])
    assert (served[:5] == 0).sum() == 4 and (served[:5] == 1).sum() == 1


def test_call_spill_dispatches_no_extra_bucket(key):
    labels = np.array([0, 0, 0, 0, 0, 1, 1, 1, 2, 2, 2, 2])
    eng = BinnedAdaptiveEngine(_classifier_from_labels(labels),
                               _const_applies(), buckets=(4,))
    calls = []
    orig = eng._bucket_steps

    def wrap(step, cls):
        def counted(x, idx, out):
            calls.append(cls)
            return step(x, idx, out)
        return counted

    eng._bucket_steps = [wrap(s, i) for i, s in enumerate(orig)]
    x = jax.random.uniform(key, (12, 8, 8, 3)) + 0.5

    eng(x, intensity=labels, spill=True)
    assert len(calls) == 3  # one bucket program per class, no overflow

    calls.clear()
    eng(x, intensity=labels, spill=False)
    assert len(calls) == 4  # fidelity mode pays the extra padded bucket


def test_stream_spill_matches_call(key):
    labels = np.array([0, 0, 0, 1, 2, 2])
    eng = BinnedAdaptiveEngine(_classifier_from_labels(labels),
                               _const_applies(), buckets=(2,))
    x = jax.random.uniform(key, (6, 8, 8, 3)) + 0.5
    direct, i_direct = eng(x, intensity=labels, spill=True)
    ((streamed, i_stream),) = list(
        eng.run_stream([x], intensities=[labels], spill=True))
    np.testing.assert_array_equal(i_direct, i_stream)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(streamed),
                               atol=1e-6)


def test_device_capacity_labels_matches_policy():
    from adam_dehaze_tpu.models.routing import _device_capacity_labels
    intensity = jnp.asarray([0, 0, 0, 0, 0, 1, 1, 1, 2, 2, 2, 2])
    logits = np.full((12, 3), -10.0, np.float32)
    logits[np.arange(12), np.asarray(intensity)] = 10.0
    logits[1, 1] = 9.9  # image 1 is the least-confident low -> it spills
    eff = np.asarray(_device_capacity_labels(
        intensity, jnp.asarray(logits), cap=4, n_cls=3))
    counts = np.bincount(eff, minlength=3)
    np.testing.assert_array_equal(counts, [4, 4, 4])
    changed = np.nonzero(eff != np.asarray(intensity))[0]
    np.testing.assert_array_equal(changed, [1])
    assert eff[1] == 1  # stronger neighbor of class 0


def test_device_capacity_labels_balanced_identity():
    from adam_dehaze_tpu.models.routing import _device_capacity_labels
    intensity = jnp.asarray(np.repeat(np.arange(3), 4))
    logits = jnp.asarray(np.eye(3, dtype=np.float32)[np.asarray(intensity)])
    eff = np.asarray(_device_capacity_labels(intensity, logits, 4, 3))
    np.testing.assert_array_equal(eff, np.asarray(intensity))


def test_device_capacity_labels_cascade_fills_all():
    from adam_dehaze_tpu.models.routing import _device_capacity_labels
    # every image predicted class 0: cap 2 per class, 6 images -> 2/2/2
    intensity = jnp.zeros((6,), jnp.int32)
    logits = jnp.asarray(np.tile([5.0, 1.0, 0.0], (6, 1)).astype(np.float32))
    eff = np.asarray(_device_capacity_labels(intensity, logits, 2, 3))
    np.testing.assert_array_equal(np.bincount(eff, minlength=3), [2, 2, 2])


def test_device_binned_spill_serves_within_capacity(key):
    from adam_dehaze_tpu.models.routing import make_device_binned_infer
    labels = np.array([0, 0, 0, 0, 0, 1, 1, 1, 2, 2, 2, 2])
    clf = _classifier_from_labels(labels)
    fn = jax.jit(make_device_binned_infer(clf, _const_applies(), chunk=4,
                                          spill=True))
    x = jax.random.uniform(key, (12, 8, 8, 3)) + 0.5
    y, intensity, _ = fn(x)
    np.testing.assert_array_equal(np.asarray(intensity), labels)
    served = _branch_of(y, x)
    counts = np.bincount(served, minlength=3)
    np.testing.assert_array_equal(counts, [4, 4, 4])
    # non-overflow classes untouched
    np.testing.assert_array_equal(served[5:], labels[5:])


def test_device_binned_spill_balanced_matches_fidelity(key):
    from adam_dehaze_tpu.models.routing import make_device_binned_infer
    labels = np.repeat(np.arange(3), 4)
    clf = _classifier_from_labels(labels)
    fid = jax.jit(make_device_binned_infer(clf, _const_applies(), chunk=4))
    sp = jax.jit(make_device_binned_infer(clf, _const_applies(), chunk=4,
                                          spill=True))
    x = jax.random.uniform(key, (12, 8, 8, 3)) + 0.5
    y_f, i_f, _ = fid(x)
    y_s, i_s, _ = sp(x)
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_s))
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s), atol=1e-6)


def test_sharded_binned_spill_is_device_local(key):
    """Capacity spill under shard_map: each device applies the plan to its
    OWN shard (no collectives) — an all-one-class stream is served 1/3 per
    branch on every device."""
    from adam_dehaze_tpu.models.routing import make_sharded_binned_infer
    from adam_dehaze_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    per_dev = 6
    n = n_dev * per_dev
    labels = np.zeros(n, np.int64)  # every image predicted low
    clf = _classifier_from_labels(labels)
    mesh = make_mesh({"data": n_dev, "spatial": 1, "model": 1})
    mesh = jax.sharding.Mesh(mesh.devices.reshape(n_dev), ("data",))
    fn = make_sharded_binned_infer(clf, _const_applies(), mesh, chunk=2,
                                   spill=True)
    x = jax.random.uniform(key, (n, 8, 8, 3)) + 0.5
    y, intensity, _ = fn(x)
    np.testing.assert_array_equal(np.asarray(intensity), labels)
    served = _branch_of(y, x)
    # per-device cap = 2 per class: every 6-image shard serves 2/2/2
    for d in range(n_dev):
        shard = served[d * per_dev:(d + 1) * per_dev]
        np.testing.assert_array_equal(np.bincount(shard, minlength=3),
                                      [2, 2, 2])


def _spill_engine():
    """Engine with bucket 2 -> per-class cap 2 on a 6-image batch."""
    return BinnedAdaptiveEngine(_classifier_from_labels([0] * 6),
                                _const_applies(), buckets=(2,))


def test_spill_up_only_never_downgrades():
    """up_only: overflow may move only to STRONGER branches; top-class
    overflow keeps its predicted class (r4 quality guard)."""
    eng = _spill_engine()
    # 6 high (class 2) in a batch of 6, cap = 2 -> 4 overflow, nowhere up.
    labels = np.array([2, 2, 2, 2, 2, 2])
    out = eng.plan_capacity_spill(labels, up_only=True)
    np.testing.assert_array_equal(out, labels)
    # Overload low (class 0): overflow moves UP into medium/high free slots.
    labels = np.array([0, 0, 0, 0, 0, 1])
    out = eng.plan_capacity_spill(labels, up_only=True)
    assert (out >= labels).all()          # only upward moves
    assert (out != labels).sum() > 0      # something spilled
    counts = np.bincount(out, minlength=3)
    assert counts[0] <= 2                 # capacity respected


def test_spill_margin_threshold_gates_eligibility():
    eng = _spill_engine()
    labels = np.array([0, 0, 0, 1, 2, 2])
    # logits: images 0-2 predicted low; image 1 is near-boundary toward
    # medium (gap 0.5), the others are confident (gap 10).
    logits = np.array([
        [10.0, 0.0, -5.0],
        [5.0, 4.5, -5.0],
        [10.0, 0.0, -5.0],
        [0.0, 10.0, -5.0],
        [-5.0, 0.0, 10.0],
        [-5.0, 0.0, 10.0],
    ])
    out = eng.plan_capacity_spill(labels, logits, up_only=True,
                                  margin_threshold=1.0)
    # only the near-boundary image may spill
    moved = np.nonzero(out != labels)[0]
    assert list(moved) == [1]
    # threshold 0 (nobody eligible) -> no moves at all
    out0 = eng.plan_capacity_spill(labels, logits, up_only=True,
                                   margin_threshold=0.0)
    np.testing.assert_array_equal(out0, labels)


def test_margin_up_route_policy():
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from probe_margin_routing import margin_up_route

    logits = np.array([
        [10.0, 0.0, -5.0],   # confident low -> stays
        [5.0, 4.8, -5.0],    # near-boundary low/medium -> bumps to medium
        [-5.0, 4.9, 5.0],    # confident high (gap n/a upward) -> stays
        [-5.0, 5.0, 4.9],    # near-boundary medium/high -> bumps to high
    ])
    out = margin_up_route(logits, tau=0.5)
    np.testing.assert_array_equal(out, [0, 1, 2, 2])
    # tau=0: plain argmax
    np.testing.assert_array_equal(margin_up_route(logits, 0.0),
                                  logits.argmax(1))
    # top class can never route up
    np.testing.assert_array_equal(
        margin_up_route(np.array([[0.0, 0.1, 0.2]]), 100.0), [2])
