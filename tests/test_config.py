import os

from adam_dehaze_tpu.config import (
    create_experiment_dir,
    default_config,
    load_config,
    update_checkpoint_paths,
)


def test_default_config_schema():
    cfg = default_config()
    # Same top-level sections as the reference config (config/config.yaml).
    for section in ("dataset", "classifier", "dehazing", "routing",
                    "joint_training", "detection", "evaluation", "device", "seed"):
        assert section in cfg
    assert cfg["classifier"]["num_classes"] == 3
    assert cfg["routing"]["type"] == "soft"
    assert cfg["routing"]["temperature"] == 0.5
    for level, ch in (("low", 32), ("medium", 64), ("high", 96)):
        assert cfg["dehazing"][level]["channels"] == ch


def test_load_config_merge(tmp_path):
    p = tmp_path / "override.yaml"
    p.write_text("routing:\n  type: hard\ndataset:\n  batch_size: 4\n")
    cfg = load_config(str(p))
    assert cfg["routing"]["type"] == "hard"
    assert cfg["routing"]["temperature"] == 0.5  # untouched default
    assert cfg["dataset"]["batch_size"] == 4


def test_experiment_dir(tmp_path):
    cfg = default_config()
    exp_dir, cfg = create_experiment_dir(cfg, "exp1", root=str(tmp_path))
    assert os.path.isdir(exp_dir)
    assert cfg["classifier"]["checkpoint_dir"].startswith(exp_dir)
    assert os.path.exists(os.path.join(exp_dir, "config.yaml"))
    cfg2 = update_checkpoint_paths(default_config(), exp_dir)
    assert cfg2["joint_training"]["checkpoint_dir"] == os.path.join(exp_dir, "checkpoints", "joint")
