#!/usr/bin/env python
"""Generate tests/fixtures/coco_golden.json: a non-trivial random detection
scene + frozen 12-stat COCO summary pinning the evaluator's semantics
(VERDICT r3: the evaluator was only self-tested on hand-built cases).

Provenance policy: if pycocotools is importable (NOT in this environment —
egress-blocked) the stats come from the C implementation and the fixture
records `"source": "pycocotools"`. Otherwise they come from the independent
loop-based oracle in tests/coco_oracle.py (a literal transliteration of the
published COCOeval algorithm) and the fixture records `"source": "oracle"`.
tests/test_coco_golden.py then asserts BOTH the production evaluator and the
oracle reproduce the frozen stats — any silent drift in either fails.

Usage: python tools/make_coco_golden.py [--use-pycocotools]
"""
import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def make_scene(seed: int = 7):
    """8 images, 3 categories, ~45 GTs across all size bins incl. crowds;
    detections = jittered GTs (varying quality) + duplicates + false
    positives + misses. Everything rounded to 2 decimals so the JSON is the
    single source of truth (no float-repr drift)."""
    rng = np.random.default_rng(seed)
    images = [{"id": i, "width": 640, "height": 640} for i in range(8)]
    categories = [{"id": c, "name": f"cat{c}"} for c in (1, 2, 3)]
    anns, results = [], []
    ann_id = 1
    for img in range(8):
        n_gt = int(rng.integers(3, 9))
        for _ in range(n_gt):
            size_bin = rng.choice(["s", "m", "l"], p=[0.3, 0.4, 0.3])
            wh = {"s": rng.uniform(8, 30, 2), "m": rng.uniform(34, 90, 2),
                  "l": rng.uniform(100, 220, 2)}[size_bin]
            x = rng.uniform(0, 640 - wh[0])
            y = rng.uniform(0, 640 - wh[1])
            cat = int(rng.integers(1, 4))
            crowd = int(rng.random() < 0.1)
            bbox = [round(float(v), 2) for v in (x, y, wh[0], wh[1])]
            anns.append({"id": ann_id, "image_id": img, "category_id": cat,
                         "bbox": bbox, "area": round(bbox[2] * bbox[3], 4),
                         "iscrowd": crowd})
            ann_id += 1
            # 0-2 detections per GT with varying jitter
            for _ in range(int(rng.integers(0, 3))):
                q = rng.uniform(0.0, 0.45)  # jitter scale
                jb = [bbox[0] + rng.normal(0, q * bbox[2]),
                      bbox[1] + rng.normal(0, q * bbox[3]),
                      bbox[2] * float(np.exp(rng.normal(0, q / 2))),
                      bbox[3] * float(np.exp(rng.normal(0, q / 2)))]
                # Sometimes the detector gets the class wrong
                dcat = cat if rng.random() > 0.1 else int(rng.integers(1, 4))
                results.append({
                    "image_id": img, "category_id": dcat,
                    "bbox": [round(max(v, 0.0), 2) for v in jb],
                    "score": round(float(rng.uniform(0.05, 0.99)), 4)})
        # pure false positives
        for _ in range(int(rng.integers(1, 4))):
            wh = rng.uniform(10, 120, 2)
            results.append({
                "image_id": img, "category_id": int(rng.integers(1, 4)),
                "bbox": [round(float(v), 2) for v in
                         (rng.uniform(0, 640 - wh[0]),
                          rng.uniform(0, 640 - wh[1]), wh[0], wh[1])],
                "score": round(float(rng.uniform(0.05, 0.99)), 4)})
    gt = {"images": images, "annotations": anns, "categories": categories}
    return gt, results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--use-pycocotools", action="store_true",
                   help="Require pycocotools (fail if missing)")
    p.add_argument("--out", default=os.path.join(
        ROOT, "tests", "fixtures", "coco_golden.json"))
    args = p.parse_args(argv)

    gt, results = make_scene()

    source = None
    if args.use_pycocotools:
        import tempfile

        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            json.dump(gt, f)
            gt_path = f.name
        coco = COCO(gt_path)
        dt = coco.loadRes([dict(r) for r in results])
        ev = COCOeval(coco, dt, "bbox")
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        keys = ["mAP", "mAP_50", "mAP_75", "mAP_small", "mAP_medium",
                "mAP_large", "AR_1", "AR_10", "AR_100", "AR_small",
                "AR_medium", "AR_large"]
        stats = {k: float(v) for k, v in zip(keys, ev.stats)}
        source = "pycocotools"
    else:
        import coco_oracle
        stats = coco_oracle.evaluate(gt, results)
        source = "oracle"

    fixture = {"source": source, "seed": 7, "gt": gt, "results": results,
               "stats": stats}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(fixture, f, indent=1)
    print(f"source={source}")
    for k, v in stats.items():
        print(f"  {k}: {v:.6f}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
