"""Evaluation metric accumulators.

Counterpart of the reference's evaluation/metrics.py:
- `calculate_image_metrics` / `ImageQualityMetrics` (reference:
  metrics.py:13-124): PSNR + gray-SSIM + LPIPS per sample with per-category
  averages and JSON export — here computed in BATCHES on device.
- `DetectionMetrics` (reference: metrics.py:126-270): COCO mAP via our own
  evaluator (evaluation/coco_eval.py) instead of the pycocotools C extension,
  same 12-stat dict and per-category re-evaluation.
"""
from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.evaluation.coco_eval import COCOEvaluator
from adam_dehaze_tpu.losses.lpips import LPIPS
from adam_dehaze_tpu.ops.image import psnr, ssim_gray


def calculate_image_metrics(pred: np.ndarray, target: np.ndarray) -> Dict[str, float]:
    """Single-image HWC convenience wrapper (reference: metrics.py:13-36)."""
    p = jnp.asarray(pred)[None]
    t = jnp.asarray(target)[None]
    return {"psnr": float(psnr(p, t)[0]), "ssim": float(ssim_gray(p, t)[0])}


class ImageQualityMetrics:
    """Accumulate PSNR/SSIM/LPIPS by category, batched on device.

    LPIPS honesty: without converted weights (lpips_params/lpips_weights)
    the perceptual distance runs on a random-init AlexNet trunk with uniform
    heads — a monotone surrogate, NOT the published LPIPS scale — so it is
    reported as `lpips_uncal`. Heads fitted in-env on synthetic ranked
    distortions (tools/calibrate_lpips.py; checkpoint sidecar marks
    `calibration_synthetic`) report `lpips_cal_synth`. Only real converted
    lpips-package weights earn the bare `lpips` key (the reference always
    uses the lpips package's pretrained net, metrics.py:44)."""

    def __init__(self, lpips_params=None, image_shape=(1, 64, 64, 3),
                 lpips_weights: Optional[str] = None):
        self.lpips_net = LPIPS()
        calibrated = lpips_params is not None or lpips_weights is not None
        synth_cal = False
        if lpips_params is None:
            dummy = jnp.zeros(image_shape, jnp.float32)
            lpips_params = self.lpips_net.init(jax.random.PRNGKey(0), dummy, dummy)
            if lpips_weights:
                from adam_dehaze_tpu.training.checkpoint import load_checkpoint
                lpips_params, wmeta = load_checkpoint(lpips_weights,
                                                      dict(lpips_params))
                synth_cal = bool(wmeta.get("calibration_synthetic"))
        self.lpips_params = lpips_params
        self.lpips_key = ("lpips_cal_synth" if synth_cal
                          else "lpips" if calibrated else "lpips_uncal")
        self.results: Dict[str, List[Dict[str, float]]] = defaultdict(list)

        @jax.jit
        def _batch_metrics(pred, target):
            return {
                "psnr": psnr(pred, target),
                "ssim": ssim_gray(pred, target),
                self.lpips_key: self.lpips_net.apply(
                    self.lpips_params, 2 * pred - 1, 2 * target - 1),
            }
        self._batch_metrics = _batch_metrics

    def add_batch(self, pred, target, category: Optional[str] = None,
                  mask: Optional[np.ndarray] = None):
        """pred/target: (N, H, W, 3) in [0, 1]."""
        m = jax.device_get(self._batch_metrics(jnp.asarray(pred),
                                               jnp.asarray(target)))
        n = pred.shape[0]
        valid = np.ones(n, bool) if mask is None else np.asarray(mask, bool)
        for i in range(n):
            if not valid[i]:
                continue
            rec = {k: float(v[i]) for k, v in m.items()}
            self.results[category or "all"].append(rec)

    def add_sample(self, pred, target, category: Optional[str] = None):
        """Single HWC sample (reference API, metrics.py:47-82)."""
        self.add_batch(np.asarray(pred)[None], np.asarray(target)[None], category)

    def compute_averages(self) -> Dict[str, Dict[str, float]]:
        """(reference: metrics.py:84-101)"""
        out = {}
        for category, recs in self.results.items():
            if not recs:
                continue
            out[category] = {k: float(np.mean([r[k] for r in recs]))
                             for k in recs[0]}
            out[category]["samples"] = len(recs)
        return out

    def print_results(self):
        avg = self.compute_averages()
        print("Image Quality Evaluation Results:")
        for category, metrics in sorted(avg.items()):
            print(f"\n{category.upper()} ({metrics['samples']} samples):")
            for name, value in metrics.items():
                if name != "samples":
                    print(f"  {name.upper()}: {value:.4f}")
        return avg

    def save_results(self, output_path: str):
        os.makedirs(os.path.dirname(output_path), exist_ok=True)
        with open(output_path, "w") as f:
            json.dump(self.compute_averages(), f, indent=2)
        print(f"Results saved to {output_path}")


def calculate_perceptual_scores(dehaze_fn, loader, vgg_params=None,
                                image_shape=(1, 64, 64, 3)) -> Dict[str, float]:
    """VGG-feature naturalness/structure scores over a dataset
    (reference: metrics.py:272-355): naturalness = 1/(1 + MSE(relu4_3)),
    structure_similarity = 1/(1 + MSE(relu2_2)), averaged over samples —
    batched on device instead of the reference's per-image VGG re-runs.
    """
    from adam_dehaze_tpu.nn.vgg import VGG16Features

    net = VGG16Features(taps=("relu2_2", "relu4_3"))
    if vgg_params is None:
        vgg_params = net.init(jax.random.PRNGKey(0),
                              jnp.zeros(image_shape, jnp.float32))

    @jax.jit
    def _scores(hazy, clear):
        dehazed, _ = dehaze_fn(hazy)
        fd = net.apply(vgg_params, dehazed)
        fc = net.apply(vgg_params, clear)
        axes = (1, 2, 3)
        nat = jnp.mean((fd["relu4_3"] - fc["relu4_3"]) ** 2, axis=axes)
        st = jnp.mean((fd["relu2_2"] - fc["relu2_2"]) ** 2, axis=axes)
        return nat, st

    tot_nat, tot_st, n = 0.0, 0.0, 0
    for batch in loader:
        nat, st = _scores(jnp.asarray(batch["hazy"]),
                          jnp.asarray(batch["clear"]))
        mask = np.asarray(batch["mask"], bool)
        tot_nat += float(np.asarray(nat)[mask].sum())
        tot_st += float(np.asarray(st)[mask].sum())
        n += int(mask.sum())
    n = max(n, 1)
    return {
        "naturalness": 1.0 / (1.0 + tot_nat / n),
        "structure_similarity": 1.0 / (1.0 + tot_st / n),
        "samples": n,
    }


class DetectionMetrics:
    """COCO-mAP accumulator with the reference's API
    (reference: metrics.py:126-270)."""

    def __init__(self, annotation_file):
        """annotation_file: path to COCO JSON, or the dict itself."""
        if isinstance(annotation_file, str):
            with open(annotation_file) as f:
                gt = json.load(f)
        else:
            gt = annotation_file
        self.evaluator = COCOEvaluator(gt)
        self.results: List[Dict] = []
        self.category_results: Dict[str, List[Dict]] = defaultdict(list)

    def add_detection_result(self, image_id, category_id, bbox, score,
                             category: Optional[str] = None):
        r = {"image_id": image_id, "category_id": int(category_id),
             "bbox": [float(v) for v in bbox], "score": float(score)}
        self.results.append(r)
        if category:
            self.category_results[category].append(r)

    def evaluate(self) -> Dict[str, float]:
        if not self.results:
            print("No detection results to evaluate")
            return {}
        return self.evaluator.evaluate(self.results)

    def evaluate_by_category(self) -> Dict[str, Dict[str, float]]:
        out = {"overall": self.evaluate()}
        for category, recs in self.category_results.items():
            out[category] = self.evaluator.evaluate(recs) if recs else {}
        return out

    def print_results(self, results=None):
        if not results:
            print("No detection results to evaluate")
            return {k: 0.0 for k in ("mAP", "mAP_50", "mAP_75", "mAP_small",
                                     "mAP_medium", "mAP_large")}
        print("Object Detection Evaluation Results:")
        for k in ("mAP", "mAP_50", "mAP_75", "mAP_small", "mAP_medium",
                  "mAP_large"):
            print(f"  {k}: {results.get(k, 0.0):.4f}")
        return results

    def save_results(self, results, output_path: str):
        os.makedirs(os.path.dirname(output_path), exist_ok=True)
        with open(output_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"Results saved to {output_path}")
