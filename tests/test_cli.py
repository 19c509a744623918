"""End-to-end CLI dispatch test: the same invocation surface as the
reference's `python main.py --mode ...` (reference: main.py:29-56)."""
import os

import pytest
import yaml

from adam_dehaze_tpu.cli import main, parse_args
from adam_dehaze_tpu.data.preprocessing import generate_synthetic_dataset


def test_parse_args_defaults():
    args = parse_args([])
    assert args.mode == "train_all"
    args = parse_args(["--mode", "evaluate", "--seed", "7",
                       "--data_dir", "/x"])
    assert args.mode == "evaluate"
    assert args.seed == 7
    with pytest.raises(SystemExit):
        parse_args(["--mode", "bogus"])


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    root = str(tmp / "data")
    generate_synthetic_dataset(root, n_per_class=4, size=32, seed=5)
    cfg = {
        "dataset": {"train_path": root, "val_path": root, "test_path": root,
                    "img_size": 32, "batch_size": 2, "num_workers": 2},
        "classifier": {"model": "mobilenet_v2", "epochs": 1},
        "dehazing": {"epochs": 1,
                     "low": {"channels": 4, "blocks": 1},
                     "medium": {"channels": 4, "blocks": 2},
                     "high": {"channels": 8, "blocks": 2}},
        "joint_training": {"epochs": 1},
        "detection": {"model": "fcos_resnet18_fpn"},
        "tpu": {"use_pallas": False, "compute_dtype": "float32"},
    }
    cfg_path = str(tmp / "tiny.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    return cfg_path, str(tmp)


@pytest.mark.slow
def test_cli_train_dehazing_and_demo(cli_env, monkeypatch):
    cfg_path, tmp = cli_env
    monkeypatch.chdir(tmp)  # experiments/ dir lands under tmp
    main(["--config", cfg_path, "--mode", "train_dehazing",
          "--exp_name", "cli_smoke"])
    exp = os.path.join(tmp, "experiments", "cli_smoke")
    assert os.path.isdir(os.path.join(exp, "checkpoints", "dehazing", "low",
                                      "best_model"))
    # Demo on the same experiment (loads stage checkpoints, writes grids).
    main(["--config", cfg_path, "--mode", "demo", "--experiment_dir", exp])
    demo_dir = os.path.join(exp, "demo")
    assert any(f.startswith("demo_batch") for f in os.listdir(demo_dir))
