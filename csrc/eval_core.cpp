// Native host-side evaluation core.
//
// The reference leans on pycocotools' C extension for COCO mAP
// (effdet/evaluator.py:10,105); this library provides the equivalent hot
// loops — greedy IoU matching of detections to ground truth across IoU
// thresholds, and greedy hard NMS — callable from Python via ctypes.
// Everything is plain C ABI, single-threaded per call (callers parallelize
// across images/classes).
//
// Build: make -C csrc   (produces libevalcore.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

inline float iou_xyxy(const float* a, const float* b) {
  const float ix1 = std::max(a[0], b[0]);
  const float iy1 = std::max(a[1], b[1]);
  const float ix2 = std::min(a[2], b[2]);
  const float iy2 = std::min(a[3], b[3]);
  const float iw = std::max(0.0f, ix2 - ix1);
  const float ih = std::max(0.0f, iy2 - iy1);
  const float inter = iw * ih;
  if (inter <= 0.0f) return 0.0f;
  const float area_a = (a[2] - a[0]) * (a[3] - a[1]);
  const float area_b = (b[2] - b[0]) * (b[3] - b[1]);
  return inter / (area_a + area_b - inter);
}

// Crowd-region overlap: intersection over the DETECTION's area
// (pycocotools maskUtils.iou with iscrowd=1).
inline float ioa_xyxy(const float* d, const float* g) {
  const float ix1 = std::max(d[0], g[0]);
  const float iy1 = std::max(d[1], g[1]);
  const float ix2 = std::min(d[2], g[2]);
  const float iy2 = std::min(d[3], g[3]);
  const float iw = std::max(0.0f, ix2 - ix1);
  const float ih = std::max(0.0f, iy2 - iy1);
  const float inter = iw * ih;
  if (inter <= 0.0f) return 0.0f;
  const float area_d = (d[2] - d[0]) * (d[3] - d[1]);
  return area_d > 0.0f ? inter / area_d : 0.0f;
}

}  // namespace

extern "C" {

// Greedy matching of one image's detections (already score-sorted
// descending) to ground truth, per IoU threshold — the exact COCOeval
// evaluateImg protocol (pycocotools cocoeval.py, bbox iouType):
//
//   det_boxes   [n_det, 4] xyxy, score-sorted descending
//   gt_boxes    [n_gt, 4] xyxy, SORTED ignored-last (stable) by the caller
//   gt_ignore   [n_gt] 1 = crowd / out-of-area-range GT
//   gt_crowd    [n_gt] 1 = crowd region (IoU denominator = det area, and
//               the GT may be matched by multiple detections)
//   det_ignore  [n_det] 1 = detection out of area range
//   thresholds  [n_thr]
//   tp_out      [n_thr * n_det] 1.0 where matched to a non-ignored GT
//   ign_out     [n_thr * n_det] 1 where the detection is ignored
//
// Protocol details that matter (all from COCOeval.evaluateImg):
//  * a det scans GTs in ignored-last order; an already-matched non-crowd
//    GT is skipped; once matched to a non-ignored GT, the scan stops at
//    the first ignored GT;
//  * equal-IoU ties go to the LATER GT in scan order (the `< best ->
//    continue` test replaces on equality);
//  * a det CAN match an ignored GT (consuming it unless crowd) and is
//    then itself ignored;
//  * an unmatched det is ignored iff its own area is out of range.
void match_detections(const float* det_boxes, int n_det,
                      const float* gt_boxes, const uint8_t* gt_ignore,
                      const uint8_t* gt_crowd, int n_gt,
                      const uint8_t* det_ignore,
                      const float* thresholds, int n_thr,
                      float* tp_out, uint8_t* ign_out) {
  // precompute the IoU matrix once; crowd GTs use intersection / det-area
  // (maskUtils.iou's iscrowd semantics)
  std::vector<float> iou(static_cast<size_t>(n_det) * n_gt);
  for (int i = 0; i < n_det; ++i)
    for (int j = 0; j < n_gt; ++j)
      iou[static_cast<size_t>(i) * n_gt + j] =
          gt_crowd[j] ? ioa_xyxy(det_boxes + 4 * i, gt_boxes + 4 * j)
                      : iou_xyxy(det_boxes + 4 * i, gt_boxes + 4 * j);

  std::vector<uint8_t> matched(n_gt);
  for (int t = 0; t < n_thr; ++t) {
    const float thr = std::min(thresholds[t], 1.0f - 1e-10f);
    std::fill(matched.begin(), matched.end(), 0);
    float* tp = tp_out + static_cast<size_t>(t) * n_det;
    uint8_t* ign = ign_out + static_cast<size_t>(t) * n_det;
    for (int i = 0; i < n_det; ++i) {
      const float* row = iou.data() + static_cast<size_t>(i) * n_gt;
      int m = -1;
      float best = thr;
      for (int j = 0; j < n_gt; ++j) {
        if (matched[j] && !gt_crowd[j]) continue;
        if (m > -1 && !gt_ignore[m] && gt_ignore[j]) break;
        if (row[j] < best) continue;
        best = row[j];
        m = j;
      }
      if (m > -1) {
        matched[m] = 1;
        ign[i] = gt_ignore[m];
        tp[i] = gt_ignore[m] ? 0.0f : 1.0f;
      } else {
        tp[i] = 0.0f;
        ign[i] = det_ignore[i];
      }
    }
  }
}

// Greedy hard NMS over score-sorted xyxy boxes. Returns number kept;
// keep_out holds the kept indices (into the sorted order).
int hard_nms(const float* boxes, const float* scores, int n,
             float iou_threshold, int max_out, int* keep_out) {
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return scores[a] > scores[b];
  });
  std::vector<uint8_t> suppressed(n, 0);
  int kept = 0;
  for (int oi = 0; oi < n && kept < max_out; ++oi) {
    const int i = order[oi];
    if (suppressed[i] || scores[i] <= 0.0f) continue;
    keep_out[kept++] = i;
    for (int oj = oi + 1; oj < n; ++oj) {
      const int j = order[oj];
      if (suppressed[j]) continue;
      if (iou_xyxy(boxes + 4 * i, boxes + 4 * j) > iou_threshold)
        suppressed[j] = 1;
    }
  }
  return kept;
}

// Pairwise IoU matrix (yxyx or xyxy — symmetric in layout as long as both
// agree): out[i*m + j] = IoU(a_i, b_j).
void iou_matrix(const float* a, int n, const float* b, int m, float* out) {
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < m; ++j)
      out[static_cast<size_t>(i) * m + j] = iou_xyxy(a + 4 * i, b + 4 * j);
}

}  // extern "C"
