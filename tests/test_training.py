"""End-to-end training-slice tests on a tiny synthetic dataset.

This is the SURVEY.md §7 'minimum end-to-end slice': data -> device -> train
-> checkpoint -> eval, with shrunk models so it runs on the CPU test mesh.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.data.preprocessing import generate_synthetic_dataset
from adam_dehaze_tpu.training import checkpoint as ckpt
from adam_dehaze_tpu.training.state import (
    ReduceLROnPlateau,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)


def tiny_config(root, tmp):
    cfg = default_config()
    cfg["dataset"].update(train_path=root, val_path=root, test_path=root,
                          img_size=32, batch_size=2, num_workers=2)
    cfg["classifier"].update(epochs=1)
    cfg["dehazing"].update(epochs=1)
    cfg["dehazing"]["low"].update(channels=4, blocks=1)
    cfg["dehazing"]["medium"].update(channels=4, blocks=2)
    cfg["dehazing"]["high"].update(channels=8, blocks=2)
    cfg["joint_training"].update(epochs=1)
    cfg["classifier"]["checkpoint_dir"] = os.path.join(tmp, "ck/classifier")
    cfg["dehazing"]["checkpoint_dir"] = os.path.join(tmp, "ck/dehazing")
    cfg["joint_training"]["checkpoint_dir"] = os.path.join(tmp, "ck/joint")
    cfg["_logs_dir"] = os.path.join(tmp, "logs")
    cfg["tpu"]["use_pallas"] = False
    cfg["tpu"]["compute_dtype"] = "float32"
    return cfg


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_train"))
    generate_synthetic_dataset(root, n_per_class=6, size=32, seed=0)
    return root


def test_optimizer_lr_injection():
    tx = make_optimizer(1e-3, 1e-4)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    assert abs(get_learning_rate(st) - 1e-3) < 1e-9
    st2 = set_learning_rate(st, 5e-4)
    assert abs(get_learning_rate(st2) - 5e-4) < 1e-9
    # Update still works after LR change.
    updates, _ = tx.update({"w": jnp.ones((3,))}, st2, params)
    assert jnp.all(jnp.isfinite(updates["w"]))


def test_plateau_scheduler():
    tx = make_optimizer(1.0)
    st = tx.init({"w": jnp.ones(())})
    sch = ReduceLROnPlateau(factor=0.5, patience=2)
    st, red = sch.step(1.0, st)
    assert not red
    for _ in range(2):
        st, red = sch.step(1.0, st)
        assert not red
    st, red = sch.step(1.0, st)  # patience exceeded
    assert red
    assert abs(get_learning_rate(st) - 0.5) < 1e-9


def test_checkpoint_roundtrip(tmp_path):
    tree = {"params": {"w": jnp.arange(4.0)}, "epoch": np.asarray(3)}
    path = ckpt.save_checkpoint(str(tmp_path), "best_model", tree,
                                {"val_psnr": 31.5})
    restored, metrics = ckpt.load_checkpoint(path, tree)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(4.0))
    assert metrics["val_psnr"] == 31.5
    # find_latest prefers epoch checkpoints.
    ckpt.save_checkpoint(str(tmp_path), "checkpoint_epoch_2", tree)
    ckpt.save_checkpoint(str(tmp_path), "checkpoint_epoch_10", tree)
    latest = ckpt.find_latest_checkpoint(str(tmp_path))
    assert latest.endswith("checkpoint_epoch_10")


def test_train_dehazing_slice(synth_root, tmp_path):
    from adam_dehaze_tpu.training.train_dehazing import (
        evaluate_dehazing_model,
        train_dehazing_model,
    )
    cfg = tiny_config(synth_root, str(tmp_path))
    model, state = train_dehazing_model("low", cfg)
    assert os.path.isdir(os.path.join(cfg["dehazing"]["checkpoint_dir"],
                                      "low", "best_model"))
    out = evaluate_dehazing_model(model, state, "low", cfg)
    assert np.isfinite(out["psnr"]) and out["psnr"] > 5
    assert 0 <= out["ssim"] <= 1


@pytest.mark.slow
def test_train_classifier_slice(synth_root, tmp_path):
    from adam_dehaze_tpu.training.train_classifier import (
        evaluate_classifier,
        train_classifier,
    )
    cfg = tiny_config(synth_root, str(tmp_path))
    cfg["classifier"]["model"] = "mobilenet_v2"  # lighter for CPU tests
    model, state = train_classifier(cfg)
    assert os.path.isdir(os.path.join(cfg["classifier"]["checkpoint_dir"],
                                      "best_model"))
    result = evaluate_classifier(model, state, cfg)
    assert 0.0 <= result["accuracy"] <= 1.0
    assert "confusion_matrix" in result


@pytest.mark.slow
def test_train_joint_slice(synth_root, tmp_path):
    from adam_dehaze_tpu.training.train_joint import (
        evaluate_joint_model,
        train_joint_model,
    )
    cfg = tiny_config(synth_root, str(tmp_path))
    cfg["classifier"]["model"] = "mobilenet_v2"
    router, state = train_joint_model(cfg)
    assert os.path.isdir(os.path.join(cfg["joint_training"]["checkpoint_dir"],
                                      "best_model"))
    out = evaluate_joint_model(router, state, cfg)
    assert np.isfinite(out["psnr"])
    assert "cls_acc" in out


@pytest.mark.slow
def test_resume_continues(synth_root, tmp_path):
    from adam_dehaze_tpu.training.train_dehazing import train_dehazing_model
    cfg = tiny_config(synth_root, str(tmp_path))
    cfg["dehazing"]["epochs"] = 5  # epoch ckpt written at epoch 5
    model, state1 = train_dehazing_model("low", cfg)
    cfg["dehazing"]["epochs"] = 6
    model, state2 = train_dehazing_model("low", cfg, resume=True)
    # Resume restored epoch 5 and ran only epoch 6.
    assert int(state2.step) > 0


@pytest.mark.slow
def test_train_joint_hard_finetune_phase(synth_root, tmp_path):
    """hard_finetune_frac tail: per-intensity 1x-branch fine-tuning runs,
    merges back into the joint state, and the result still serves/evaluates
    (VERDICT r3 item 5)."""
    from adam_dehaze_tpu.training.train_joint import (
        evaluate_joint_model,
        train_joint_model,
    )
    cfg = tiny_config(synth_root, str(tmp_path))
    cfg["classifier"]["model"] = "mobilenet_v2"
    cfg["joint_training"]["epochs"] = 2
    cfg["joint_training"]["hard_finetune_frac"] = 0.5  # epoch 2 goes hard
    router, state = train_joint_model(cfg)
    out = evaluate_joint_model(router, state, cfg)
    assert np.isfinite(out["psnr"]) and out["psnr"] > 5
