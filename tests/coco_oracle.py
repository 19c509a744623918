"""Test-only oracle: direct loop-based transliteration of the published
pycocotools COCOeval 'bbox' algorithm (evaluateImg/accumulate/summarize).

Purpose: pin `adam_dehaze_tpu.evaluation.coco_eval.COCOEvaluator`'s
vectorised semantics against an INDEPENDENT implementation of the same
published protocol, and freeze the result in tests/fixtures/coco_golden.json
(pycocotools itself does not exist in this environment; the day it does,
`tools/make_coco_golden.py --use-pycocotools` regenerates the fixture from
the C implementation and records that provenance).

Deliberately slow and literal — per-image/category/area/maxdet loops, no
vectorisation — so a bug in the production evaluator cannot be mirrored
here by construction.
"""
from __future__ import annotations

import numpy as np

IOU_THRS = [0.5 + 0.05 * i for i in range(10)]
REC_THRS = [i / 100.0 for i in range(101)]
AREA_RANGES = [("all", 0.0, 1e10), ("small", 0.0, 32.0 ** 2),
               ("medium", 32.0 ** 2, 96.0 ** 2), ("large", 96.0 ** 2, 1e10)]
MAX_DETS = [1, 10, 100]


def _iou(det, gt, crowd):
    dx1, dy1, dw, dh = det
    gx1, gy1, gw, gh = gt
    ix = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
    iy = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
    if ix <= 0 or iy <= 0:
        return 0.0
    inter = ix * iy
    union = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / union if union > 0 else 0.0


def _evaluate_img(gts, dts, area_rng, max_det):
    """One (image, category): returns dict or None (both sides empty).

    gts: [{bbox, area?, iscrowd?}]; dts: [{bbox, score}]."""
    if not gts and not dts:
        return None
    lo, hi = area_rng
    for g in gts:
        a = g.get("area", g["bbox"][2] * g["bbox"][3])
        g["_ignore"] = 1 if (g.get("iscrowd", 0) or a < lo or a > hi) else 0
    # sort gts ignore-last, dets score-desc (both stable)
    gt = sorted(gts, key=lambda g: g["_ignore"])
    dt = sorted(dts, key=lambda d: -d["score"])[:max_det]
    iscrowd = [int(g.get("iscrowd", 0)) for g in gt]
    ious = [[_iou(d["bbox"], g["bbox"], iscrowd[gi])
             for gi, g in enumerate(gt)] for d in dt]

    T, G, D = len(IOU_THRS), len(gt), len(dt)
    gtm = [[0] * G for _ in range(T)]
    dtm = [[0] * D for _ in range(T)]
    gt_ig = [g["_ignore"] for g in gt]
    dt_ig = [[0] * D for _ in range(T)]
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind][gind] > 0 and not iscrowd[gind]:
                    continue
                if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                    break
                if ious[dind][gind] < iou:
                    continue
                iou = ious[dind][gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind][dind] = gt_ig[m]
            dtm[tind][dind] = 1
            if not iscrowd[m]:
                # crowd GTs stay matchable (the skip condition above only
                # consults gtm for non-crowd GTs, as in pycocotools)
                gtm[tind][m] = 1
    for tind in range(T):
        for dind in range(D):
            a = dt[dind]["bbox"][2] * dt[dind]["bbox"][3]
            if dtm[tind][dind] == 0 and (a < lo or a > hi):
                dt_ig[tind][dind] = 1
    return {
        "dtScores": [d["score"] for d in dt],
        "dtMatches": dtm,
        "dtIgnore": dt_ig,
        "num_gt": sum(1 for g in gt if not g["_ignore"]),
    }


def evaluate(gt_coco, results):
    """gt_coco: COCO dict (images/annotations/categories); results:
    [{image_id, category_id, bbox xywh, score}]. Returns the 12-stat dict
    with COCOEvaluator's key names."""
    img_ids = sorted({im["id"] for im in gt_coco.get("images", [])})
    cat_ids = sorted({c["id"] for c in gt_coco.get("categories", [])})
    gts = {}
    for a in gt_coco.get("annotations", []):
        gts.setdefault((a["image_id"], a["category_id"]), []).append(dict(a))
    dts = {}
    for r in results:
        dts.setdefault((r["image_id"], r["category_id"]), []).append(dict(r))

    T, R = len(IOU_THRS), len(REC_THRS)
    # precision[a][m]: K x T x R list; recall[a][m]: K x T
    stats = {}
    table = {}
    for area_name, lo, hi in AREA_RANGES:
        for max_det in MAX_DETS:
            precisions, recalls = [], []
            for cat in cat_ids:
                evs = [
                    _evaluate_img([dict(g) for g in gts.get((i, cat), [])],
                                  [dict(d) for d in dts.get((i, cat), [])],
                                  (lo, hi), max_det)
                    for i in img_ids
                ]
                evs = [e for e in evs if e is not None]
                npig = sum(e["num_gt"] for e in evs)
                if npig == 0:
                    precisions.append(None)
                    recalls.append(None)
                    continue
                scores = np.array(
                    [s for e in evs for s in e["dtScores"]], float)
                order = np.argsort(-scores, kind="mergesort")
                prec_t = np.zeros((T, R))
                rec_t = np.zeros(T)
                for tind in range(T):
                    m = np.array([v for e in evs
                                  for v in e["dtMatches"][tind]], float)
                    ig = np.array([v for e in evs
                                   for v in e["dtIgnore"][tind]], bool)
                    m, ig = m[order], ig[order]
                    tps = np.cumsum((m == 1) & ~ig).astype(float)
                    fps = np.cumsum((m == 0) & ~ig).astype(float)
                    nd = len(tps)
                    rc = tps / npig
                    pr = tps / (fps + tps + np.spacing(1))
                    rec_t[tind] = rc[-1] if nd else 0.0
                    q = [0.0] * R
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds):
                        if pi < nd:
                            q[ri] = pr[pi]
                    prec_t[tind] = q
                precisions.append(prec_t)
                recalls.append(rec_t)
            table[(area_name, max_det)] = (precisions, recalls)

    def ap(area, max_det, tind=None):
        ps = [p for p in table[(area, max_det)][0] if p is not None]
        if not ps:
            return -1.0
        vals = np.stack(ps) if tind is None else np.stack(ps)[:, tind]
        return float(vals[vals > -1].mean())

    def ar(area, max_det):
        rs = [r for r in table[(area, max_det)][1] if r is not None]
        if not rs:
            return -1.0
        return float(np.stack(rs).mean())

    stats = {
        "mAP": ap("all", 100),
        "mAP_50": ap("all", 100, 0),
        "mAP_75": ap("all", 100, 5),
        "mAP_small": ap("small", 100),
        "mAP_medium": ap("medium", 100),
        "mAP_large": ap("large", 100),
        "AR_1": ar("all", 1),
        "AR_10": ar("all", 10),
        "AR_100": ar("all", 100),
        "AR_small": ar("small", 100),
        "AR_medium": ar("medium", 100),
        "AR_large": ar("large", 100),
    }
    return stats
