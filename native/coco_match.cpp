// Greedy COCO detection<->GT matching (the inner loop of mAP evaluation).
//
// Native counterpart of the pycocotools C extension the reference depends on
// (reference: evaluation/metrics.py:10-11). The Python fallback lives in
// adam_dehaze_tpu/evaluation/coco_eval.py:_match_image; this implements the
// identical algorithm: per IoU threshold, visit detections in score order,
// match each to the best still-available GT (non-ignored GTs first; crowd
// GTs may absorb multiple detections).
//
// Build: make -C native   (g++ -O3 -shared -fPIC -> libcocomatch.so)
// ABI: plain C arrays, loaded via ctypes.

#include <cstdint>

extern "C" {

// ious:        n_det * n_gt row-major IoU matrix
// det_order:   n_det detection indices sorted by descending score
// gt_order:    n_gt GT indices, non-ignored first
// gt_ignore:   n_gt flags
// gt_iscrowd:  n_gt flags
// iou_thrs:    n_thr thresholds
// dtm:         n_thr * n_det output, matched GT index or -1 (pre-filled ok)
// dt_ig:       n_thr * n_det output, 1 if matched to an ignored GT
void coco_match(const double* ious, const int32_t* det_order,
                const int32_t* gt_order, const uint8_t* gt_ignore,
                const uint8_t* gt_iscrowd, const double* iou_thrs,
                int32_t n_det, int32_t n_gt, int32_t n_thr,
                int64_t* dtm, uint8_t* dt_ig) {
  // gtm scratch: one flag per GT, reset per threshold.
  // n_gt is bounded by the per-image annotation count; stack VLA avoided.
  uint8_t* gtm = new uint8_t[n_gt > 0 ? n_gt : 1];

  for (int32_t ti = 0; ti < n_thr; ++ti) {
    const double thr = iou_thrs[ti];
    for (int32_t g = 0; g < n_gt; ++g) gtm[g] = 0;

    for (int32_t di = 0; di < n_det; ++di) {
      const int32_t d = det_order[di];
      double best_iou = thr < (1.0 - 1e-10) ? thr : (1.0 - 1e-10);
      int32_t best_g = -1;

      for (int32_t gi = 0; gi < n_gt; ++gi) {
        const int32_t g = gt_order[gi];
        if (gtm[g] && !gt_iscrowd[g]) continue;
        // Matched to a non-ignored GT already and remaining GTs are all
        // ignored (gt_order puts ignored last): stop searching.
        if (best_g > -1 && !gt_ignore[best_g] && gt_ignore[g]) break;
        const double iou = ious[(int64_t)d * n_gt + g];
        if (iou < best_iou) continue;
        best_iou = iou;
        best_g = g;
      }

      const int64_t out = (int64_t)ti * n_det + d;
      if (best_g >= 0) {
        dtm[out] = best_g;
        dt_ig[out] = gt_ignore[best_g];
        if (!gt_iscrowd[best_g]) gtm[best_g] = 1;
      } else {
        dtm[out] = -1;
        dt_ig[out] = 0;
      }
    }
  }
  delete[] gtm;
}

}  // extern "C"
