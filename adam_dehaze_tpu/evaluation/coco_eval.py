"""COCO-style detection evaluation (own numpy implementation).

Replaces the pycocotools C extension the reference depends on
(reference: evaluation/metrics.py:10-11,163-208) with a self-contained,
vectorised evaluator producing the same 12-stat summary:
AP@[.5:.95], AP@.5, AP@.75, AP S/M/L, AR@{1,10,100}, AR S/M/L.

Protocol notes (matching COCOeval 'bbox' defaults):
- IoU thresholds 0.50:0.05:0.95; recall thresholds 0:0.01:1.
- Greedy per-image matching in score order; each GT matched at most once;
  crowd GTs may absorb extra detections and use intersection/det-area IoU.
- GTs outside the area range are "ignore"; detections matched to ignored GTs
  (or unmatched with area outside range) are removed from the PR curve.
- AP = mean of interpolated precision sampled at the recall thresholds,
  averaged over IoU thresholds and categories with GT present.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def box_iou_xywh(dets: np.ndarray, gts: np.ndarray,
                 iscrowd: Optional[np.ndarray] = None) -> np.ndarray:
    """IoU matrix (n_det, n_gt) for [x, y, w, h] boxes; crowd GTs use
    intersection / det-area (COCO convention)."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    dx1, dy1 = dets[:, 0], dets[:, 1]
    dx2, dy2 = dets[:, 0] + dets[:, 2], dets[:, 1] + dets[:, 3]
    gx1, gy1 = gts[:, 0], gts[:, 1]
    gx2, gy2 = gts[:, 0] + gts[:, 2], gts[:, 1] + gts[:, 3]
    ix = np.maximum(0, np.minimum(dx2[:, None], gx2[None]) -
                    np.maximum(dx1[:, None], gx1[None]))
    iy = np.maximum(0, np.minimum(dy2[:, None], gy2[None]) -
                    np.maximum(dy1[:, None], gy1[None]))
    inter = ix * iy
    d_area = (dets[:, 2] * dets[:, 3])[:, None]
    g_area = (gts[:, 2] * gts[:, 3])[None]
    union = d_area + g_area - inter
    if iscrowd is not None and iscrowd.any():
        union = np.where(iscrowd[None].astype(bool), d_area, union)
    return inter / np.maximum(union, 1e-12)


_NATIVE = None
_NATIVE_TRIED = False


def _load_native():
    """Load (building if needed) the C++ matcher from native/; None on any
    failure — the Python loop below is the fallback."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    import ctypes
    import os
    import subprocess
    native_dir = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    lib_path = os.path.join(native_dir, "libcocomatch.so")
    try:
        if not os.path.exists(lib_path):
            subprocess.run(["make", "-C", native_dir], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(lib_path)
        lib.coco_match.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.coco_match.restype = None
        _NATIVE = lib
    except Exception:
        _NATIVE = None
    return _NATIVE


def _match_image_native(lib, det_scores, ious, gt_ignore, gt_iscrowd, n_thrs):
    import ctypes
    n_det, n_gt = ious.shape
    det_order = np.argsort(-det_scores, kind="stable").astype(np.int32)
    gt_order = np.argsort(gt_ignore.astype(int), kind="stable").astype(np.int32)
    ious_c = np.ascontiguousarray(ious, np.float64)
    gt_ig = np.ascontiguousarray(gt_ignore, np.uint8)
    gt_cr = np.ascontiguousarray(gt_iscrowd, np.uint8)
    thrs = np.ascontiguousarray(IOU_THRS, np.float64)
    dtm = np.empty((n_thrs, n_det), np.int64)
    dt_ig = np.empty((n_thrs, n_det), np.uint8)

    def p(arr, ty):
        return arr.ctypes.data_as(ctypes.POINTER(ty))
    lib.coco_match(p(ious_c, ctypes.c_double), p(det_order, ctypes.c_int32),
                   p(gt_order, ctypes.c_int32), p(gt_ig, ctypes.c_uint8),
                   p(gt_cr, ctypes.c_uint8), p(thrs, ctypes.c_double),
                   np.int32(n_det), np.int32(n_gt), np.int32(n_thrs),
                   p(dtm, ctypes.c_int64), p(dt_ig, ctypes.c_uint8))
    return dtm, dt_ig.astype(bool)


def _match_image(det_scores, ious, gt_ignore, gt_iscrowd, n_thrs):
    lib = _load_native()
    if lib is not None and ious.size:
        return _match_image_native(lib, det_scores, ious, gt_ignore,
                                   gt_iscrowd, n_thrs)
    return _match_image_py(det_scores, ious, gt_ignore, gt_iscrowd, n_thrs)


def _match_image_py(det_scores, ious, gt_ignore, gt_iscrowd, n_thrs):
    """Greedy COCO matching for one (image, category).

    GTs are visited non-ignored first (pycocotools sorts them this way, which
    its early-break relies on). Returns (dt_matched_gt [T, D] with -1
    unmatched, dt_ignore [T, D])."""
    n_det, n_gt = ious.shape
    det_order = np.argsort(-det_scores, kind="stable")
    gt_order = np.argsort(gt_ignore.astype(int), kind="stable")
    dtm = -np.ones((n_thrs, n_det), np.int64)
    dt_ig = np.zeros((n_thrs, n_det), bool)
    for ti, t in enumerate(IOU_THRS):
        gtm = np.zeros(n_gt, bool)
        for d in det_order:
            best_iou = min(t, 1 - 1e-10)
            best_g = -1
            for g in gt_order:
                if gtm[g] and not gt_iscrowd[g]:
                    continue
                # Already matched to a non-ignored GT and the remaining GTs
                # are all ignored: stop (pycocotools' break).
                if best_g > -1 and not gt_ignore[best_g] and gt_ignore[g]:
                    break
                if ious[d, g] < best_iou:
                    continue
                best_iou = ious[d, g]
                best_g = g
            if best_g >= 0:
                dtm[ti, d] = best_g
                dt_ig[ti, d] = gt_ignore[best_g]
                if not gt_iscrowd[best_g]:
                    gtm[best_g] = True
    return dtm, dt_ig


class COCOEvaluator:
    """Evaluate detection results against COCO-format ground truth."""

    def __init__(self, gt: Dict):
        """gt: COCO dict with 'images', 'annotations', 'categories'."""
        self.images = {im["id"] for im in gt.get("images", [])}
        self.cat_ids = sorted({c["id"] for c in gt.get("categories", [])})
        self.gts: Dict = {}
        for ann in gt.get("annotations", []):
            key = (ann["image_id"], ann["category_id"])
            self.gts.setdefault(key, []).append(ann)

    def evaluate(self, results: Sequence[Dict]) -> Dict[str, float]:
        """results: [{image_id, category_id, bbox xywh, score}, ...] ->
        the 12-stat dict with pycocotools' key names
        (reference: evaluation/metrics.py:193-206)."""
        dets: Dict = {}
        for r in results:
            key = (r["image_id"], r["category_id"])
            dets.setdefault(key, []).append(r)

        T = len(IOU_THRS)
        stats_ap = {}
        stats_ar = {}
        for area_name, area_rng in AREA_RANGES.items():
            per_cat_prec = []   # (T, R) per category
            per_cat_rec = {m: [] for m in MAX_DETS}
            for cat in self.cat_ids or sorted({k[1] for k in self.gts}):
                ev = self._evaluate_category(cat, dets, area_rng)
                if ev is None:
                    continue
                prec, recalls = ev
                per_cat_prec.append(prec)
                for m in MAX_DETS:
                    per_cat_rec[m].append(recalls[m])
            if per_cat_prec:
                P = np.stack(per_cat_prec)  # (K, T, R)
                stats_ap[area_name] = {
                    "all_iou": float(np.mean(P[P > -1])) if (P > -1).any() else -1.0,
                    "iou50": _mean_valid(P[:, 0]),
                    "iou75": _mean_valid(P[:, 5]),
                }
                stats_ar[area_name] = {
                    m: _mean_valid(np.stack(per_cat_rec[m]))
                    for m in MAX_DETS
                }
            else:
                stats_ap[area_name] = {"all_iou": -1.0, "iou50": -1.0, "iou75": -1.0}
                stats_ar[area_name] = {m: -1.0 for m in MAX_DETS}

        return {
            "mAP": stats_ap["all"]["all_iou"],
            "mAP_50": stats_ap["all"]["iou50"],
            "mAP_75": stats_ap["all"]["iou75"],
            "mAP_small": stats_ap["small"]["all_iou"],
            "mAP_medium": stats_ap["medium"]["all_iou"],
            "mAP_large": stats_ap["large"]["all_iou"],
            "AR_1": stats_ar["all"][1],
            "AR_10": stats_ar["all"][10],
            "AR_100": stats_ar["all"][100],
            "AR_small": stats_ar["small"][100],
            "AR_medium": stats_ar["medium"][100],
            "AR_large": stats_ar["large"][100],
        }

    def _evaluate_category(self, cat, dets, area_rng):
        T, R = len(IOU_THRS), len(REC_THRS)
        all_scores, all_matched, all_ignored = [], [], []
        n_gt_valid = 0
        img_ids = self.images or {k[0] for k in list(self.gts) + list(dets)}
        per_image = []
        for img in img_ids:
            g = self.gts.get((img, cat), [])
            d = sorted(dets.get((img, cat), []), key=lambda r: -r["score"])
            d = d[:MAX_DETS[-1]]
            if not g and not d:
                continue
            g_boxes = np.array([a["bbox"] for a in g], float).reshape(-1, 4)
            g_crowd = np.array([a.get("iscrowd", 0) for a in g], bool)
            g_area = np.array([a.get("area", b[2] * b[3])
                               for a, b in zip(g, g_boxes)], float)
            g_ignore = (g_area < area_rng[0]) | (g_area > area_rng[1]) | g_crowd
            d_boxes = np.array([r["bbox"] for r in d], float).reshape(-1, 4)
            d_scores = np.array([r["score"] for r in d], float)
            d_area = d_boxes[:, 2] * d_boxes[:, 3]
            ious = box_iou_xywh(d_boxes, g_boxes, g_crowd)
            dtm, dt_ig = _match_image(d_scores, ious, g_ignore, g_crowd, T)
            # Unmatched dets outside the area range are ignored too.
            out_of_range = (d_area < area_rng[0]) | (d_area > area_rng[1])
            dt_ig = dt_ig | ((dtm == -1) & out_of_range[None])
            n_gt_valid += int((~g_ignore).sum())
            per_image.append((d_scores, dtm, dt_ig))
        if n_gt_valid == 0:
            return None

        recalls_at_m = {}
        prec_out = -np.ones((T, R))
        for max_det in MAX_DETS:
            scores = np.concatenate([p[0][:max_det] for p in per_image]) \
                if per_image else np.zeros(0)
            matched = np.concatenate([p[1][:, :max_det] for p in per_image],
                                     axis=1) if per_image else np.zeros((T, 0))
            ignored = np.concatenate([p[2][:, :max_det] for p in per_image],
                                     axis=1) if per_image else np.zeros((T, 0), bool)
            order = np.argsort(-scores, kind="mergesort")
            matched = matched[:, order]
            ignored = ignored[:, order]
            tps = (matched > -1) & ~ignored
            fps = (matched == -1) & ~ignored
            tp_cum = np.cumsum(tps, axis=1).astype(float)
            fp_cum = np.cumsum(fps, axis=1).astype(float)
            rc = tp_cum / n_gt_valid
            pr = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
            recalls_at_m[max_det] = rc[:, -1] if rc.shape[1] else np.zeros(T)
            if max_det == MAX_DETS[-1]:
                for ti in range(T):
                    p = pr[ti].copy()
                    if len(p) == 0:
                        prec_out[ti] = 0.0
                        continue
                    # Interpolated precision (monotone non-increasing).
                    for i in range(len(p) - 1, 0, -1):
                        p[i - 1] = max(p[i - 1], p[i])
                    idx = np.searchsorted(rc[ti], REC_THRS, side="left")
                    safe = np.minimum(idx, len(p) - 1)
                    prec_out[ti] = np.where(idx < len(p), p[safe], 0.0)
        recalls = {m: recalls_at_m[m] for m in MAX_DETS}
        return prec_out, recalls


def _mean_valid(arr: np.ndarray) -> float:
    valid = arr[arr > -1]
    return float(valid.mean()) if valid.size else -1.0
