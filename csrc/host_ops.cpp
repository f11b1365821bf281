// Host-side native ops for the TPU detection framework.
//
// TPU-native equivalents of the reference's CPU kernels:
//   * greedy NMS        (ref: mmdet/ops/nms/src/nms_cpu.cpp)
//   * soft-NMS          (ref: mmdet/ops/nms/src/soft_nms_cpu.pyx)
//   * pairwise IoU      (ref: mmdet/core/evaluation/bbox_overlaps.py hot path)
//   * COCO det<->gt greedy matching (ref capability: pycocotools' C evaluateImg)
//
// The DEVICE NMS lives in ioudet/ops/nms.py (jitted XLA); these host kernels
// serve the evaluation pipeline (COCO matching over thousands of images) and
// small host-side post-processing, where a C loop beats numpy dispatch.
//
// Exposed via extern "C" + ctypes (no pybind11 in the build image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

inline float iou_one(const float* a, const float* b, bool plus_one) {
  const float off = plus_one ? 1.0f : 0.0f;
  const float iw =
      std::min(a[2], b[2]) - std::max(a[0], b[0]) + off;
  const float ih =
      std::min(a[3], b[3]) - std::max(a[1], b[1]) + off;
  if (iw <= 0 || ih <= 0) return 0.0f;
  const float inter = iw * ih;
  const float area_a = (a[2] - a[0] + off) * (a[3] - a[1] + off);
  const float area_b = (b[2] - b[0] + off) * (b[3] - b[1] + off);
  return inter / (area_a + area_b - inter);
}

}  // namespace

extern "C" {

// Greedy NMS. boxes: (n, 4) xyxy; scores: (n,). Writes keep flags (n,) and
// returns the number kept.  plus_one selects the v1 +1 pixel convention.
int nms_cpu(const float* boxes, const float* scores, int n, float iou_thr,
            int plus_one, uint8_t* keep) {
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<uint8_t> suppressed(n, 0);
  int kept = 0;
  for (int oi = 0; oi < n; ++oi) {
    const int i = order[oi];
    if (suppressed[i]) continue;
    keep[i] = 1;
    ++kept;
    for (int oj = oi + 1; oj < n; ++oj) {
      const int j = order[oj];
      if (suppressed[j]) continue;
      if (iou_one(boxes + 4 * i, boxes + 4 * j, plus_one) > iou_thr)
        suppressed[j] = 1;
    }
  }
  return kept;
}

// Soft-NMS (method: 0 linear, 1 gaussian, 2 naive/hard).  Updates scores
// in-place in selection order; writes selection order into `order_out`
// (-1 padded); returns number selected (score > min_score).
int soft_nms_cpu(const float* boxes, float* scores, int n, float iou_thr,
                 float sigma, float min_score, int method, int plus_one,
                 int* order_out) {
  std::vector<int> alive(n);
  std::iota(alive.begin(), alive.end(), 0);
  int count = 0;
  for (int t = 0; t < n; ++t) order_out[t] = -1;
  while (!alive.empty()) {
    // argmax over alive
    int best_pos = 0;
    for (size_t k = 1; k < alive.size(); ++k)
      if (scores[alive[k]] > scores[alive[best_pos]]) best_pos = (int)k;
    const int i = alive[best_pos];
    if (scores[i] <= min_score) break;
    order_out[count++] = i;
    alive.erase(alive.begin() + best_pos);
    for (int j : alive) {
      const float ov = iou_one(boxes + 4 * i, boxes + 4 * j, plus_one);
      float w = 1.0f;
      if (method == 0) {          // linear
        if (ov > iou_thr) w = 1.0f - ov;
      } else if (method == 1) {   // gaussian
        w = std::exp(-(ov * ov) / sigma);
      } else {                    // naive
        if (ov > iou_thr) w = 0.0f;
      }
      scores[j] *= w;
    }
  }
  return count;
}

// Pairwise IoU/IoF: out (n, m) row-major.  mode: 0 iou, 1 iof.
void bbox_overlaps_cpu(const float* b1, int n, const float* b2, int m,
                       int mode, int plus_one, float* out) {
  const float off = plus_one ? 1.0f : 0.0f;
  for (int i = 0; i < n; ++i) {
    const float* a = b1 + 4 * i;
    const float area_a = (a[2] - a[0] + off) * (a[3] - a[1] + off);
    for (int j = 0; j < m; ++j) {
      const float* b = b2 + 4 * j;
      const float iw = std::min(a[2], b[2]) - std::max(a[0], b[0]) + off;
      const float ih = std::min(a[3], b[3]) - std::max(a[1], b[1]) + off;
      float v = 0.0f;
      if (iw > 0 && ih > 0) {
        const float inter = iw * ih;
        float denom;
        if (mode == 0) {
          const float area_b = (b[2] - b[0] + off) * (b[3] - b[1] + off);
          denom = area_a + area_b - inter;
        } else {
          denom = area_a;
        }
        v = inter / std::max(denom, 1e-10f);
      }
      out[(size_t)i * m + j] = v;
    }
  }
}

// COCO greedy matching for one (image, category) cell and T thresholds.
// ious: (D, G) in det-score-desc x gt order (crowd-adjusted upstream);
// gt_ignore: (G,); iscrowd: (G,); thrs: (T,).
// Outputs dtm (T, D): matched gt index + 1 (0 = unmatched); dt_ignore (T, D).
void coco_match_cpu(const float* ious, int D, int G, const uint8_t* gt_ignore,
                    const uint8_t* iscrowd, const double* thrs, int T,
                    int64_t* dtm, uint8_t* dt_ignore) {
  std::vector<int64_t> gtm(G);
  for (int t = 0; t < T; ++t) {
    std::fill(gtm.begin(), gtm.end(), 0);
    for (int d = 0; d < D; ++d) {
      double best = std::min(thrs[t], 1.0 - 1e-10);
      int best_g = -1;
      for (int g = 0; g < G; ++g) {
        if (gtm[g] > 0 && !iscrowd[g]) continue;
        if (best_g > -1 && !gt_ignore[best_g] && gt_ignore[g]) break;
        const double v = ious[(size_t)d * G + g];
        if (v < best) continue;
        best = v;
        best_g = g;
      }
      if (best_g == -1) continue;
      dt_ignore[(size_t)t * D + d] = gt_ignore[best_g];
      dtm[(size_t)t * D + d] = best_g + 1;
      gtm[best_g] = d + 1;
    }
  }
}

// Intersection area of two column-major RLEs on the same grid, WITHOUT
// decoding to pixels (ref capability: pycocotools rleArea/rleIou run-walk).
// counts start with a zero-run; value of run i is i % 2.
int64_t rle_intersect_area(const int64_t* a, int na, const int64_t* b,
                           int nb) {
  int64_t inter = 0;
  int ia = 0, ib = 0;
  int64_t ra = na > 0 ? a[0] : 0;  // remaining length of current run
  int64_t rb = nb > 0 ? b[0] : 0;
  while (ia < na && ib < nb) {
    const int64_t step = std::min(ra, rb);
    if ((ia % 2) && (ib % 2)) inter += step;
    ra -= step;
    rb -= step;
    while (ia < na && ra == 0) ra = (++ia < na) ? a[ia] : 0;
    while (ib < nb && rb == 0) rb = (++ib < nb) ? b[ib] : 0;
  }
  return inter;
}

// (D, G) mask IoU straight from concatenated run-count buffers.
// d_counts/g_counts: concatenated int64 runs; *_offs: (n+1,) prefix offsets;
// d_areas/g_areas: precomputed foreground areas; iscrowd: (G,) -> IoF.
void rle_iou_matrix(const int64_t* d_counts, const int64_t* d_offs, int D,
                    const int64_t* g_counts, const int64_t* g_offs, int G,
                    const int64_t* d_areas, const int64_t* g_areas,
                    const uint8_t* iscrowd, double* out) {
  for (int i = 0; i < D; ++i) {
    const int64_t* dc = d_counts + d_offs[i];
    const int nd = (int)(d_offs[i + 1] - d_offs[i]);
    for (int j = 0; j < G; ++j) {
      const int64_t inter = rle_intersect_area(
          dc, nd, g_counts + g_offs[j], (int)(g_offs[j + 1] - g_offs[j]));
      const double denom =
          iscrowd[j] ? (double)d_areas[i]
                     : (double)(d_areas[i] + g_areas[j] - inter);
      out[(size_t)i * G + j] = inter / std::max(denom, 1e-10);
    }
  }
}

}  // extern "C"
