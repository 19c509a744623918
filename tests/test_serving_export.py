"""Precompiled serving bundles (serving_export.py): export AOT-compiled
executables, reload them with zero traces/compiles, serve identically."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.serving_export import (
    MANIFEST,
    PrecompiledDispatch,
    bundle_compatible,
    export_program,
    load_bundle_programs,
    read_manifest,
    set_manifest_extra,
)


def test_export_load_roundtrip(tmp_path, rng):
    """A serialized executable reproduces the jitted fn, including closure
    constants (how serving applies carry their weights)."""
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32))

    @jax.jit
    def fn(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y)

    x = rng.random((2, 8, 8, 4), dtype=np.float32)
    fname = export_program(fn, (x,), "conv", str(tmp_path))
    assert os.path.exists(tmp_path / fname)
    ok, reason = bundle_compatible(str(tmp_path))
    assert ok, reason

    table = load_bundle_programs(str(tmp_path))
    assert "conv" in table and len(table["conv"]) == 1
    (loaded,) = table["conv"].values()
    np.testing.assert_allclose(np.asarray(loaded(x)), np.asarray(fn(x)),
                               atol=1e-6)


def test_dispatch_hits_and_fallback(tmp_path, rng):
    """Exported shapes run the loaded executable; others fall back to jit."""
    @jax.jit
    def fn(x):
        return x * 2.0

    x4 = rng.random((4, 8), dtype=np.float32)
    x3 = rng.random((3, 8), dtype=np.float32)
    export_program(fn, (x4,), "mul", str(tmp_path))
    table = load_bundle_programs(str(tmp_path))
    d = PrecompiledDispatch(fn, table["mul"])
    np.testing.assert_allclose(np.asarray(d(x4)), x4 * 2, atol=1e-7)
    assert (d.hits, d.misses) == (1, 0)
    np.testing.assert_allclose(np.asarray(d(x3)), x3 * 2, atol=1e-7)
    assert (d.hits, d.misses) == (1, 1)


def test_bound_program_roundtrip(tmp_path, rng):
    """n_bound=1: weights ride as a bound argument, not baked constants —
    the dispatcher prepends the bound tree, refuses a mismatched one."""
    v = {"w": jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32)),
         "b": jnp.asarray(rng.standard_normal((8,)).astype(np.float32))}

    @jax.jit
    def fn(v, x):
        return jax.nn.relu(x @ v["w"] + v["b"])

    x = rng.random((4, 8), dtype=np.float32)
    export_program(fn, (v, x), "lin", str(tmp_path), n_bound=1)
    table = load_bundle_programs(str(tmp_path))
    (prog,) = table["lin"].values()
    assert prog.n_bound == 1 and prog.bound_sig

    d = PrecompiledDispatch(lambda xx: fn(v, xx), table["lin"], bind=(v,))
    np.testing.assert_allclose(np.asarray(d(x)), np.asarray(fn(v, x)),
                               atol=1e-6)
    assert (d.hits, d.misses) == (1, 0)
    # DIFFERENT weights bound -> different results through the same program.
    v2 = jax.tree_util.tree_map(lambda a: a * 2.0, v)
    d2 = PrecompiledDispatch(lambda xx: fn(v2, xx), table["lin"], bind=(v2,))
    np.testing.assert_allclose(np.asarray(d2(x)), np.asarray(fn(v2, x)),
                               atol=1e-6)
    # MISMATCHED bound avals -> program dropped at attach, jit fallback.
    v_bad = {"w": v["w"], "b": jnp.zeros((4,), jnp.float32)}
    with pytest.warns(UserWarning, match="bound-arg signature"):
        d3 = PrecompiledDispatch(lambda xx: xx * 0.0, table["lin"],
                                 bind=(v_bad,))
    assert not d3._programs
    assert float(np.abs(d3(x)).max()) == 0.0 and d3.misses == 1


def test_incompatible_bundle_refused(tmp_path, rng):
    @jax.jit
    def fn(x):
        return x + 1.0

    export_program(fn, (rng.random((2, 2), dtype=np.float32),), "add",
                   str(tmp_path))
    manifest = read_manifest(str(tmp_path))
    manifest["meta"]["device_kind"] = "TPU v999"
    with open(tmp_path / MANIFEST, "w") as f:
        json.dump(manifest, f)
    ok, reason = bundle_compatible(str(tmp_path))
    assert not ok and "device_kind" in reason
    with pytest.raises(ValueError):
        load_bundle_programs(str(tmp_path))


def test_manifest_extra(tmp_path):
    set_manifest_extra(str(tmp_path), quant=None, autotune=False)
    manifest = read_manifest(str(tmp_path))
    assert manifest["extra"] == {"quant": None, "autotune": False}


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    """Minimal trained experiment (mirrors tests/test_serving.py)."""
    import yaml

    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.data.preprocessing import generate_synthetic_dataset
    from adam_dehaze_tpu.training.train_joint import train_joint_model

    tmp = str(tmp_path_factory.mktemp("export"))
    root = os.path.join(tmp, "data")
    generate_synthetic_dataset(root, n_per_class=4, size=32, seed=5)
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


@pytest.mark.slow
def test_bundle_serves_identically(experiment, rng):
    """export_precompiled -> from_experiment(precompiled=...) serves the
    exact same results through loaded executables (dispatch hits, zero
    misses on exported shapes)."""
    from adam_dehaze_tpu.serving import AdaptiveDehazer

    bundle = os.path.join(experiment, "precompiled")
    ref = AdaptiveDehazer.from_experiment(experiment)
    written = ref.export_precompiled(
        bundle, batch_sizes=(4,), buckets=(1, 2, 4), queue_buckets=(4,),
        device_buckets=(4,), device_chunk=2)
    assert len(written) >= 3 * 3 + 2 + 3 + 1  # steps + clf/logits + branches + device
    # Weightless: the whole bundle must be code-only (MBs, not the models).
    total = sum(os.path.getsize(os.path.join(bundle, f))
                for f in os.listdir(bundle))
    assert total < 50e6, f"bundle unexpectedly large: {total/1e6:.1f} MB"

    d = AdaptiveDehazer.from_experiment(experiment, precompiled="auto")
    assert d._bundle_table, "bundle must load on the same backend"
    images = rng.random((4, 32, 32, 3), dtype=np.float32)
    want, i_want = ref.route_hard(images)
    got, i_got = d.route_hard(images)
    np.testing.assert_array_equal(i_got, i_want)
    np.testing.assert_allclose(got, want, atol=1e-6)

    engine = d._binned_engine()
    assert isinstance(engine._classify, PrecompiledDispatch)
    assert engine._classify.hits >= 1 and engine._classify.misses == 0
    steps_hit = sum(s.hits for s in engine._bucket_steps
                    if isinstance(s, PrecompiledDispatch))
    assert steps_hit >= 1

    # Device-binned single-program path through the bundle.
    want_dev, i_dev = ref.route_device_binned(images, chunk=2)
    got_dev, i_gdev = d.route_device_binned(images, chunk=2)
    np.testing.assert_array_equal(i_gdev, i_dev)
    np.testing.assert_allclose(got_dev, want_dev, atol=1e-6)
    dev_fn = d._engines["device_binned_2_False"]
    assert isinstance(dev_fn, PrecompiledDispatch) and dev_fn.hits >= 1

    # Queued serving rides the exported plain branch applies.
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32)
               for _ in range(4)]
    xs = np.concatenate(batches)
    want_q, labels = ref.route_hard(xs)
    got_q = np.zeros_like(want_q)
    for out, gidx, cls in d.route_hard_queued(batches, queue_bucket=4):
        got_q[gidx] = out
    np.testing.assert_allclose(got_q, want_q, atol=1e-6)


@pytest.mark.slow
def test_bundle_quant_mismatch_refused(experiment, rng):
    """A bundle exported under a different serving_quant never attaches."""
    import yaml

    from adam_dehaze_tpu.serving import AdaptiveDehazer

    bundle = os.path.join(experiment, "precompiled")
    if not os.path.isdir(bundle):
        ref = AdaptiveDehazer.from_experiment(experiment)
        ref.export_precompiled(bundle, batch_sizes=(4,), buckets=(1,),
                               queue_buckets=(), device_buckets=())
    set_manifest_extra(bundle, quant="int8")
    try:
        with pytest.warns(UserWarning, match="quant"):
            d = AdaptiveDehazer.from_experiment(experiment,
                                                precompiled=bundle)
        assert d._bundle_table is None
        # Serving still works via plain jit.
        images = rng.random((2, 32, 32, 3), dtype=np.float32)
        out, _ = d.route_hard(images)
        assert out.shape == images.shape
    finally:
        set_manifest_extra(bundle, quant=None)


@pytest.mark.slow
def test_lowres_engine_not_bundle_backed(experiment, rng):
    """The lowres quality-dial engine must NOT serve bundle programs (same
    signatures, different math)."""
    from adam_dehaze_tpu.serving import AdaptiveDehazer

    bundle = os.path.join(experiment, "precompiled")
    if not os.path.isdir(bundle):
        ref = AdaptiveDehazer.from_experiment(experiment)
        ref.export_precompiled(bundle, batch_sizes=(4,), buckets=(1, 2, 4),
                               queue_buckets=(), device_buckets=())
    d = AdaptiveDehazer.from_experiment(experiment, precompiled=bundle)
    engine = d._binned_engine(lowres=("high",))
    assert not isinstance(engine._classify, PrecompiledDispatch)
    assert not any(isinstance(s, PrecompiledDispatch)
                   for s in engine._bucket_steps)
