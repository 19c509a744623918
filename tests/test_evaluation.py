"""End-to-end evaluation pipeline on the tiny synthetic dataset."""
import json
import os

import numpy as np
import pytest

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.data.preprocessing import generate_synthetic_dataset
from adam_dehaze_tpu.evaluation.metrics import ImageQualityMetrics


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_eval"))
    generate_synthetic_dataset(root, n_per_class=4, size=32, seed=1)
    return root


def eval_config(root, tmp):
    cfg = default_config()
    cfg["dataset"].update(train_path=root, val_path=root, test_path=root,
                          img_size=32, batch_size=2, num_workers=2)
    cfg["classifier"]["model"] = "mobilenet_v2"
    cfg["dehazing"]["low"].update(channels=4, blocks=1)
    cfg["dehazing"]["medium"].update(channels=4, blocks=2)
    cfg["dehazing"]["high"].update(channels=8, blocks=2)
    cfg["detection"]["model"] = "fcos_resnet18_fpn"
    cfg["classifier"]["checkpoint_dir"] = os.path.join(tmp, "ck/classifier")
    cfg["dehazing"]["checkpoint_dir"] = os.path.join(tmp, "ck/dehazing")
    cfg["joint_training"]["checkpoint_dir"] = os.path.join(tmp, "ck/joint")
    cfg["evaluation"]["results_dir"] = os.path.join(tmp, "results/metrics")
    cfg["evaluation"]["visualization_dir"] = os.path.join(tmp, "results/vis")
    cfg["tpu"]["use_pallas"] = False
    cfg["tpu"]["compute_dtype"] = "float32"
    return cfg


def test_image_quality_metrics_accumulator(rng):
    iq = ImageQualityMetrics(image_shape=(1, 16, 16, 3))
    a = rng.random((4, 16, 16, 3), dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    iq.add_batch(b[:2], a[:2], "low_intensity")
    iq.add_batch(b[2:], a[2:], "high_intensity")
    avg = iq.compute_averages()
    assert set(avg) == {"low_intensity", "high_intensity"}
    for cat in avg:
        assert avg[cat]["samples"] == 2
        assert {"psnr", "ssim", "lpips_uncal"} <= set(avg[cat])
    # Single-sample API matches the batch API.
    iq2 = ImageQualityMetrics(image_shape=(1, 16, 16, 3))
    iq2.add_sample(b[0], a[0])
    assert iq2.compute_averages()["all"]["samples"] == 1


@pytest.mark.slow
def test_run_comprehensive_evaluation(synth_root, tmp_path):
    from adam_dehaze_tpu.evaluation.evaluate import run_comprehensive_evaluation
    cfg = eval_config(synth_root, str(tmp_path))
    results = run_comprehensive_evaluation(cfg)
    # Reference JSON schema (reference: evaluate.py:522-538) + the fixed-
    # pipeline rows (adaptive-vs-fixed framing, reference README.md:146-149).
    assert set(results) == {"baseline", "joint", "fixed", "hard_routing",
                            "detection", "comparison", "baseline_comparison"}
    assert "psnr_improvement" in results["comparison"]
    # Reference-rows side-by-side block (BASELINE.md / README.md:129-131).
    bc = results["baseline_comparison"]
    assert bc["rows"] and all(
        {"reference", "ours", "delta"} <= set(r) for r in bc["rows"].values())
    # No-reference FADE analog on hazy vs dehazed (honest proxy label).
    assert {"hazy", "dehazed", "reduction_pct"} <= set(
        results["joint"]["fade_proxy"])
    assert {"fidelity", "spill", "spill_up", "routing_acc",
            "spilled_frac", "spilled_frac_up"} <= set(results["hard_routing"])
    assert "improvement_percent" in results["detection"]
    assert set(results["fixed"]) == {"fixed_low", "fixed_medium", "fixed_high"}
    for row in results["fixed"].values():
        assert "psnr" in row and "ssim" in row
        # Each fixed branch scored the WHOLE test set (test split holds
        # 1 image per class: n_per_class=4 x 0.25 test fraction).
        assert row["samples"] == 3
    assert "best_fixed_psnr" in results["comparison"]
    assert "adaptive_vs_best_fixed_psnr" in results["comparison"]
    assert "by_level" in results["detection"]
    out_file = os.path.join(cfg["evaluation"]["results_dir"],
                            "comprehensive_results.json")
    assert os.path.exists(out_file)
    with open(out_file) as f:
        loaded = json.load(f)
    assert loaded["comparison"]["baseline_avg_psnr"] == pytest.approx(
        results["comparison"]["baseline_avg_psnr"])
    # Visualisations were written.
    assert os.path.exists(os.path.join(cfg["evaluation"]["visualization_dir"],
                                       "joint_comparison.png"))


def test_demo_mode(synth_root, tmp_path):
    from adam_dehaze_tpu.cli import run_demo
    cfg = eval_config(synth_root, str(tmp_path))
    run_demo(cfg, str(tmp_path), max_batches=1)
    demo_dir = os.path.join(str(tmp_path), "demo")
    assert any(f.startswith("demo_batch") for f in os.listdir(demo_dir))


@pytest.mark.slow
def test_evaluate_hard_routing(synth_root, tmp_path):
    """Predicted-traffic hard routing quality rows, fidelity vs spill."""
    from adam_dehaze_tpu.evaluation.evaluate import evaluate_hard_routing
    cfg = eval_config(synth_root, str(tmp_path))
    res = evaluate_hard_routing(cfg)
    assert {"fidelity", "spill", "spill_ordered", "routing_acc",
            "spilled_frac", "spilled_frac_ordered"} <= set(res)
    assert res["fidelity"].get("samples", 0) > 0
    assert res["spill"]["samples"] == res["fidelity"]["samples"]
    assert res["spill_ordered"]["samples"] == res["fidelity"]["samples"]
    assert 0.0 <= res["routing_acc"] <= 1.0
    assert 0.0 <= res["spilled_frac"] <= 1.0
    assert 0.0 <= res["spilled_frac_ordered"] <= 1.0
    for mode in ("fidelity", "spill", "spill_ordered"):
        assert np.isfinite(res[mode]["psnr"])
