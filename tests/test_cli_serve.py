"""CLI `serve` mode: directory-in -> dehazed PNGs + routing manifest out,
through each serving engine (cli.py:run_serve — a user-facing inference
surface the reference never had; its demo is a TODO stub, main.py:210-215).
"""
import json
import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.data.preprocessing import _write_rgb


def _tiny_config():
    config = default_config()
    config["tpu"]["compute_dtype"] = "float32"
    config["dataset"]["img_size"] = 32
    config["dataset"]["batch_size"] = 4
    for lvl, ch in (("low", 4), ("medium", 4), ("high", 8)):
        config["dehazing"][lvl]["channels"] = ch
        config["dehazing"][lvl]["blocks"] = 1
    config["classifier"]["model"] = "resnet18"
    return config


@pytest.fixture(scope="module")
def tiny_pipeline():
    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.models.routing import create_router
    from adam_dehaze_tpu.training.state import TrainState

    config = _tiny_config()
    router = create_router(create_branch_models(config),
                           create_classifier(config), config)
    x0 = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = router.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(0)}, x0)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"], opt_state=None)
    return config, router, state


@pytest.fixture()
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "inputs"
    for i in range(6):
        _write_rgb(str(d / f"img_{i:02d}.png"),
                   rng.uniform(size=(32, 32, 3)).astype(np.float32))
    return str(d)


@pytest.mark.parametrize("serve_mode,lowres", [
    ("hard", ""), ("queued", ""), ("soft", ""), ("hard", "high,medium")])
def test_run_serve_modes(tiny_pipeline, image_dir, tmp_path, monkeypatch,
                         serve_mode, lowres):
    from adam_dehaze_tpu import cli
    from adam_dehaze_tpu.evaluation import evaluate as eval_mod

    config, router, state = tiny_pipeline
    monkeypatch.setattr(eval_mod, "_load_joint",
                        lambda cfg: (router, state))
    out_dir = str(tmp_path / f"served_{serve_mode}")
    args = SimpleNamespace(data_dir=image_dir, serve_mode=serve_mode,
                           queue_bucket=4, max_wait_batches=1, out=out_dir,
                           lowres=lowres)
    cli.run_serve(config, str(tmp_path), args)

    served = sorted(f for f in os.listdir(out_dir) if f.endswith(".png"))
    assert served == [f"img_{i:02d}.png" for i in range(6)]
    with open(os.path.join(out_dir, "routing.json")) as f:
        manifest = json.load(f)
    assert manifest["serve_mode"] == serve_mode
    if serve_mode == "soft":
        assert manifest["images"] == {}
    else:
        assert set(manifest["images"]) == set(served)
        for v in manifest["images"].values():
            assert v["branch"] in ("low", "medium", "high")
            assert 0 <= v["intensity"] <= 2


def test_serve_mode_in_cli_choices():
    from adam_dehaze_tpu import cli

    assert "serve" in cli.MODES
    args = cli.parse_args(["--mode", "serve", "--serve_mode", "queued",
                           "--queue_bucket", "8", "--max_wait_batches", "2"])
    assert (args.mode, args.serve_mode, args.queue_bucket,
            args.max_wait_batches) == ("serve", "queued", 8, 2)


def test_run_serve_no_inputs_errors(tiny_pipeline, tmp_path, monkeypatch):
    from adam_dehaze_tpu import cli
    from adam_dehaze_tpu.evaluation import evaluate as eval_mod

    config, router, state = tiny_pipeline
    monkeypatch.setattr(eval_mod, "_load_joint",
                        lambda cfg: (router, state))
    empty = tmp_path / "empty"
    empty.mkdir()
    args = SimpleNamespace(data_dir=str(empty), serve_mode="hard",
                           queue_bucket=4, max_wait_batches=None, out=None)
    with pytest.raises(SystemExit):
        cli.run_serve(config, str(tmp_path), args)


def test_export_then_serve_precompiled(tiny_pipeline, image_dir, tmp_path,
                                       monkeypatch):
    """`--mode export` writes a bundle; `serve --precompiled auto` serves
    identical results through loaded executables (cli.py:run_export)."""
    from adam_dehaze_tpu import cli
    from adam_dehaze_tpu.evaluation import evaluate as eval_mod
    from adam_dehaze_tpu.serving_export import read_manifest

    config, router, state = tiny_pipeline
    monkeypatch.setattr(eval_mod, "_load_joint",
                        lambda cfg: (router, state))
    exp_dir = str(tmp_path)
    args = SimpleNamespace(precompiled=None, queue_bucket=4)
    cli.run_export(config, exp_dir, args)
    bundle = os.path.join(exp_dir, "precompiled")
    assert read_manifest(bundle)["programs"]

    out_a = str(tmp_path / "served_plain")
    out_b = str(tmp_path / "served_bundle")
    base = dict(data_dir=image_dir, serve_mode="hard", queue_bucket=4,
                max_wait_batches=None, lowres="")
    cli.run_serve(config, exp_dir,
                  SimpleNamespace(out=out_a, precompiled=None, **base))
    cli.run_serve(config, exp_dir,
                  SimpleNamespace(out=out_b, precompiled="auto", **base))
    from adam_dehaze_tpu.data.dataset import _imread_rgb
    for name in sorted(os.listdir(out_a)):
        if not name.endswith(".png"):
            continue
        a = _imread_rgb(os.path.join(out_a, name), 32)
        b = _imread_rgb(os.path.join(out_b, name), 32)
        np.testing.assert_array_equal(a, b)


def test_export_mode_in_cli_choices():
    from adam_dehaze_tpu import cli

    assert "export" in cli.MODES
    args = cli.parse_args(["--mode", "export", "--precompiled", "auto"])
    assert (args.mode, args.precompiled) == ("export", "auto")


def test_serve_detect_writes_detections(tiny_pipeline, image_dir, tmp_path,
                                        monkeypatch):
    """--detect runs the detector on the dehazed outputs and writes
    detections.json with xyxy boxes inside the image bounds."""
    from adam_dehaze_tpu import cli
    from adam_dehaze_tpu.evaluation import evaluate as eval_mod

    config, router, state = tiny_pipeline
    monkeypatch.setattr(eval_mod, "_load_joint",
                        lambda cfg: (router, state))
    out_dir = str(tmp_path / "served_detect")
    args = SimpleNamespace(data_dir=image_dir, serve_mode="hard",
                           queue_bucket=4, max_wait_batches=None,
                           out=out_dir, lowres="", detect=True)
    cli.run_serve(config, str(tmp_path), args)

    with open(os.path.join(out_dir, "detections.json")) as f:
        detections = json.load(f)
    assert set(detections) == {f"img_{i:02d}.png" for i in range(6)}
    size = config["dataset"]["img_size"]
    for det in detections.values():
        assert set(det) == {"boxes", "scores", "labels"}
        assert len(det["boxes"]) == len(det["scores"]) == len(det["labels"])
        for box in det["boxes"]:
            x0, y0, x1, y1 = box
            assert 0 <= x0 <= x1 <= size and 0 <= y0 <= y1 <= size
