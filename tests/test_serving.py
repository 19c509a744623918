import os

import numpy as np
import pytest

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.data.preprocessing import generate_synthetic_dataset
from adam_dehaze_tpu.serving import AdaptiveDehazer

pytestmark = __import__('pytest').mark.slow  # heavy joint/serving graphs


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    """A minimal 'trained' experiment: joint checkpoint from one epoch."""
    import yaml

    from adam_dehaze_tpu.training.train_joint import train_joint_model

    tmp = str(tmp_path_factory.mktemp("serve"))
    root = os.path.join(tmp, "data")
    generate_synthetic_dataset(root, n_per_class=4, size=32, seed=3)
    cfg = default_config()
    cfg["dataset"].update(train_path=root, val_path=root, test_path=root,
                          img_size=32, batch_size=2, num_workers=2)
    cfg["classifier"]["model"] = "mobilenet_v2"
    for level, ch in (("low", 4), ("medium", 4), ("high", 8)):
        cfg["dehazing"][level].update(channels=ch, blocks=1)
    cfg["joint_training"]["epochs"] = 1
    exp_dir = os.path.join(tmp, "exp")
    ckpt_root = os.path.join(exp_dir, "checkpoints")
    cfg["classifier"]["checkpoint_dir"] = os.path.join(ckpt_root, "classifier")
    cfg["dehazing"]["checkpoint_dir"] = os.path.join(ckpt_root, "dehazing")
    cfg["joint_training"]["checkpoint_dir"] = os.path.join(ckpt_root, "joint")
    cfg["_logs_dir"] = os.path.join(exp_dir, "logs")
    cfg["tpu"]["use_pallas"] = False
    cfg["tpu"]["compute_dtype"] = "float32"
    train_joint_model(cfg)
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "config.yaml"), "w") as f:
        yaml.dump({k: v for k, v in cfg.items() if not k.startswith("_")}, f)
    return exp_dir


def test_lazy_build_inside_trace():
    """AdaptiveDehazer._lazy defers serving-apply construction to first
    call; that first call may land INSIDE a jit trace (the engines trace
    branch fns into their dispatch programs). The built closure's constants
    must come out concrete — not tracers of the enclosing trace — so that
    every LATER program can reuse the cached closure (the plain cold-start
    path died with UnexpectedTracerError before ensure_compile_time_eval
    was added; logs/cold_start_r3b.log)."""
    import jax
    import jax.numpy as jnp

    built = []

    def build():
        # Stands in for the weight folds in make_serving_apply: jnp ops on
        # concrete arrays producing closure constants.
        k = jnp.arange(12.0, dtype=jnp.float32).reshape(4, 3)
        k2 = (k * 2.0).astype(jnp.bfloat16)
        built.append(k2)
        return lambda x: x @ k2.astype(x.dtype)

    fn = AdaptiveDehazer._lazy(build)
    x = np.ones((2, 4), np.float32)
    first = jax.jit(fn)(x)                      # build fires inside a trace
    assert isinstance(built[0], jax.Array) and not isinstance(
        built[0], jax.core.Tracer)
    second = jax.jit(lambda y: fn(y) + 1.0)(x)  # a DIFFERENT program reuses it
    np.testing.assert_allclose(np.asarray(second),
                               np.asarray(first) + 1.0, rtol=1e-2)
    assert len(built) == 1  # built exactly once


def test_serving_roundtrip(experiment, rng):
    dehazer = AdaptiveDehazer.from_experiment(experiment)
    images = rng.random((4, 32, 32, 3), dtype=np.float32)
    out = dehazer(images)
    assert out.shape == images.shape
    assert out.min() >= 0 and out.max() <= 1

    cls = dehazer.classify(images)
    assert cls.shape == (4,)
    assert set(np.unique(cls)) <= {0, 1, 2}

    hard, intensity = dehazer.route_hard(images)
    assert hard.shape == images.shape
    np.testing.assert_array_equal(intensity, cls)

    sw, i_sw = dehazer.route_switch(images)
    np.testing.assert_array_equal(i_sw, intensity)
    # Switch and binned paths agree (same branch per image).
    np.testing.assert_allclose(sw, hard, rtol=1e-5, atol=1e-6)

    dev, i_dev = dehazer.route_device_binned(images, chunk=2)
    np.testing.assert_array_equal(i_dev, intensity)
    np.testing.assert_allclose(dev, hard, rtol=1e-5, atol=1e-6)


def test_serving_lowres_auto(experiment, rng):
    """lowres='auto' consumes the experiment's tuned resolution policy
    (resolution_autotune.py) — loud when absent, per-level dial when
    present. low stays the exact path, so its routed images must match the
    plain engine bit-for-bit; medium/high go through the guided lift."""
    import json

    dehazer = AdaptiveDehazer.from_experiment(experiment)
    images = rng.random((6, 32, 32, 3), dtype=np.float32)
    with pytest.raises(FileNotFoundError):
        dehazer.route_hard(images, lowres="auto")
    policy = {"levels": {
        "low": {"choice": "full"},
        "medium": {"choice": "guided_r4_s2", "mode": "guided", "radius": 4,
                   "scale": 2},
        "high": {"choice": "guided_r4_s2", "mode": "guided", "radius": 4,
                 "scale": 2}}}
    with open(os.path.join(experiment, "resolution_policy.json"), "w") as f:
        json.dump(policy, f)
    out, intensity = dehazer.route_hard(images, lowres="auto")
    assert out.shape == images.shape
    assert any(k.startswith("binned_lowres_") for k in dehazer._engines)
    base, i_base = dehazer.route_hard(images)
    np.testing.assert_array_equal(intensity, i_base)
    low_rows = intensity == 0
    if low_rows.any():
        np.testing.assert_allclose(out[low_rows], base[low_rows], atol=1e-6)


def test_serving_default_lowres_policy(experiment, rng):
    """from_experiment(lowres='auto') makes the tuned policy the DEFAULT
    dispatch: plain route_hard uses the lowres engine, an explicit
    lowres=() overrides back to full resolution."""
    import json

    policy = {"levels": {
        "low": {"choice": "full"},
        "medium": {"choice": "full"},
        "high": {"choice": "guided_r4_s2", "mode": "guided", "radius": 4,
                 "scale": 2}}}
    with open(os.path.join(experiment, "resolution_policy.json"), "w") as f:
        json.dump(policy, f)
    dehazer = AdaptiveDehazer.from_experiment(experiment, lowres="auto")
    images = rng.random((4, 32, 32, 3), dtype=np.float32)
    out, _ = dehazer.route_hard(images)
    assert out.shape == images.shape
    assert any(k.startswith("binned_lowres_") for k in dehazer._engines)
    out_full, _ = dehazer.route_hard(images, lowres=())
    assert "binned" in dehazer._engines  # explicit () -> the plain engine


def test_serving_stream(experiment, rng):
    dehazer = AdaptiveDehazer.from_experiment(experiment)
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32) for _ in range(3)]
    direct = [dehazer.route_hard(b) for b in batches]
    streamed = list(dehazer.route_hard_stream(batches))
    assert len(streamed) == 3
    for (yd, idir), (ys, istr) in zip(direct, streamed):
        np.testing.assert_array_equal(idir, istr)
        np.testing.assert_allclose(yd, ys, atol=1e-6)


def test_serving_device_binned_stream(experiment, rng):
    """The async single-program stream yields the same results as per-batch
    device-binned calls, in order, for any pipeline depth vs batch count."""
    dehazer = AdaptiveDehazer.from_experiment(experiment)
    batches = [rng.random((4, 32, 32, 3), dtype=np.float32) for _ in range(4)]
    direct = [dehazer.route_device_binned(b, chunk=2) for b in batches]
    streamed = list(dehazer.route_device_binned_stream(batches, chunk=2,
                                                       depth=2))
    assert len(streamed) == 4
    for (yd, idir), (ys, istr) in zip(direct, streamed):
        np.testing.assert_array_equal(idir, istr)
        np.testing.assert_allclose(yd, ys, atol=1e-6)


def test_serving_device_binned_stream_ragged(experiment, rng):
    """Ragged traffic pads to the bucket ladder: every batch size maps onto a
    precompiled program (round-2 verdict item #5 — no per-shape retrace), and
    pad rows are sliced out of the yielded results."""
    import jax

    dehazer = AdaptiveDehazer.from_experiment(experiment)
    sizes = [8, 7, 3, 1, 7, 3, 8, 1]
    batches = [rng.random((n, 32, 32, 3), dtype=np.float32) for n in sizes]

    # Count traces of the underlying engine: each jit trace of the device-
    # binned program bumps the counter; repeated sizes must not re-trace.
    from adam_dehaze_tpu.models.routing import make_device_binned_infer
    traces = []
    inner = make_device_binned_infer(dehazer._classifier_apply(),
                                     dehazer._branch_applies(), chunk=2)

    def counted(x, intensity=None):
        traces.append(x.shape)
        return inner(x, intensity)

    dehazer._engines["device_binned_2_False"] = jax.jit(counted)

    streamed = list(dehazer.route_device_binned_stream(
        batches, chunk=2, depth=2, buckets=(1, 2, 4, 8)))
    assert [out.shape[0] for out, _ in streamed] == sizes
    # Distinct padded shapes only: {8, 8(7->8), 4(3->4), 1} -> 3 traces.
    assert len(traces) == 3, traces
    assert sorted(set(s[0] for s in traces)) == [1, 4, 8]

    # Results match the unpadded per-batch engine calls.
    for (out, inten), b in zip(streamed, batches):
        yd, idir = dehazer.route_device_binned(b, chunk=2)
        np.testing.assert_array_equal(inten, idir)
        np.testing.assert_allclose(out, yd, atol=1e-6)


def test_serving_queued(experiment, rng):
    """route_hard_queued == fidelity outputs, full index coverage."""
    dehazer = AdaptiveDehazer.from_experiment(experiment)
    batches = [rng.random((3, 32, 32, 3), dtype=np.float32)
               for _ in range(3)]
    xs = np.concatenate(batches)
    want, labels = dehazer.route_hard(xs)
    got = np.zeros_like(want)
    seen = []
    for out, gidx, cls in dehazer.route_hard_queued(batches, queue_bucket=4):
        assert (labels[gidx] == cls).all()
        got[gidx] = out
        seen.append(gidx)
    np.testing.assert_array_equal(np.sort(np.concatenate(seen)),
                                  np.arange(9))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_serving_autotuned_dispatch(experiment, rng):
    """from_experiment(autotune=True): tuned applies serve identically and
    the decision cache lands in the experiment dir."""
    dehazer = AdaptiveDehazer.from_experiment(experiment, autotune=True)
    images = rng.random((4, 32, 32, 3), dtype=np.float32)
    ref = AdaptiveDehazer.from_experiment(experiment)
    out, intensity = dehazer.route_hard(images)
    want, i_want = ref.route_hard(images)
    np.testing.assert_array_equal(intensity, i_want)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
    assert set(dehazer.autotune_report) == {"low", "medium", "high"}
    cache = os.path.join(experiment, "serving_autotune.json")
    assert os.path.exists(cache)
    # a fresh instance reuses the cache without re-timing
    dehazer2 = AdaptiveDehazer.from_experiment(experiment, autotune=True)
    dehazer2.route_hard(images)
    assert all(r["cached"] for r in dehazer2.autotune_report.values())


def test_serving_route_sharded(experiment, rng):
    """Multi-chip serving from the product API: route_sharded over the
    8-virtual-device data mesh matches host-binned hard routing, including
    a ragged batch that pads up to the axis size."""
    import jax

    dehazer = AdaptiveDehazer.from_experiment(experiment)
    n_dev = len(jax.devices())
    assert n_dev == 8  # conftest forces the 8-device CPU mesh

    # Ragged (6 -> padded to 8) and multi-bucket (16) batches.
    for n in (6, 16):
        images = rng.random((n, 32, 32, 3), dtype=np.float32)
        want, i_want = dehazer.route_hard(images)
        got, i_got = dehazer.route_sharded(images, chunk=2)
        assert got.shape == images.shape
        np.testing.assert_array_equal(i_got, i_want)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
