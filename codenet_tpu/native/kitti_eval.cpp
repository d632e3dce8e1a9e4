// KITTI offline detection evaluator (C++), reference-grade scorer.
//
// Fresh implementation of the metric computed by the reference's
// tools/kitti_eval/evaluate_object_3d_offline.cpp (948 LoC, shelled out to
// by lib/datasets/dataset/kitti.py:84-88): 41-point interpolated AP for 2D
// detection, bird's-eye-view and 3D boxes, plus AOS (orientation), at the
// three KITTI difficulty levels (easy/moderate/hard gates on min height /
// occlusion / truncation).
//
// Exposed as a C ABI for ctypes (codenet_tpu/eval/kitti_eval.py): the
// caller passes flat arrays of GT and detection records; results are the
// per-difficulty APs.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr int kNSample = 41;
constexpr double kMinOverlap2D[3] = {0.7, 0.5, 0.5};  // car, ped, cyc
constexpr double kMinOverlap3D[3] = {0.7, 0.5, 0.5};
// difficulty gates: MIN_HEIGHT, MAX_OCCLUSION, MAX_TRUNCATION
constexpr double kMinHeight[3] = {40.0, 25.0, 25.0};
constexpr int kMaxOcclusion[3] = {0, 1, 2};
constexpr double kMaxTruncation[3] = {0.15, 0.3, 0.5};

struct Box {  // one GT or detection record
  int cls;         // 0 car, 1 pedestrian, 2 cyclist, -1 dontcare/other
  double x1, y1, x2, y2;
  double h, w, l;  // dimensions
  double tx, ty, tz;
  double ry;
  double alpha;
  double score;
  int occlusion;
  double truncation;
};

double box2d_iou(const Box& a, const Box& b) {
  double ix = std::min(a.x2, b.x2) - std::max(a.x1, b.x1);
  double iy = std::min(a.y2, b.y2) - std::max(a.y1, b.y1);
  if (ix <= 0 || iy <= 0) return 0.0;
  double inter = ix * iy;
  double ua = (a.x2 - a.x1) * (a.y2 - a.y1) +
              (b.x2 - b.x1) * (b.y2 - b.y1) - inter;
  return inter / ua;
}

struct Pt {
  double x, y;
};

// corners of a rotated BEV rectangle (x-z plane, yaw ry)
void bev_corners(const Box& b, Pt out[4]) {
  double c = std::cos(b.ry), s = std::sin(b.ry);
  double dx[4] = {b.l / 2, b.l / 2, -b.l / 2, -b.l / 2};
  double dz[4] = {b.w / 2, -b.w / 2, -b.w / 2, b.w / 2};
  for (int i = 0; i < 4; ++i) {
    out[i].x = b.tx + c * dx[i] + s * dz[i];
    out[i].y = b.tz - s * dx[i] + c * dz[i];
  }
}

// polygon area (shoelace, abs)
double poly_area(const std::vector<Pt>& p) {
  double a = 0;
  for (size_t i = 0; i < p.size(); ++i) {
    const Pt& u = p[i];
    const Pt& v = p[(i + 1) % p.size()];
    a += u.x * v.y - v.x * u.y;
  }
  return std::fabs(a) / 2;
}

// Sutherland-Hodgman clip of subject polygon by convex clip polygon
std::vector<Pt> clip_poly(std::vector<Pt> subject, const Pt clip[4]) {
  for (int e = 0; e < 4 && !subject.empty(); ++e) {
    Pt A = clip[e];
    Pt B = clip[(e + 1) % 4];
    auto inside = [&](const Pt& p) {
      return (B.x - A.x) * (p.y - A.y) - (B.y - A.y) * (p.x - A.x) <= 1e-12;
    };
    auto intersect = [&](const Pt& p, const Pt& q) {
      double a1 = B.y - A.y, b1 = A.x - B.x;
      double c1 = a1 * A.x + b1 * A.y;
      double a2 = q.y - p.y, b2 = p.x - q.x;
      double c2 = a2 * p.x + b2 * p.y;
      double det = a1 * b2 - a2 * b1;
      Pt r;
      if (std::fabs(det) < 1e-12) {
        r = p;
      } else {
        r.x = (b2 * c1 - b1 * c2) / det;
        r.y = (a1 * c2 - a2 * c1) / det;
      }
      return r;
    };
    std::vector<Pt> out;
    for (size_t i = 0; i < subject.size(); ++i) {
      Pt cur = subject[i];
      Pt prev = subject[(i + subject.size() - 1) % subject.size()];
      bool cin = inside(cur), pin = inside(prev);
      if (cin) {
        if (!pin) out.push_back(intersect(prev, cur));
        out.push_back(cur);
      } else if (pin) {
        out.push_back(intersect(prev, cur));
      }
    }
    subject = out;
  }
  return subject;
}

// ensure clockwise order for the clip convention above
void make_cw(Pt p[4]) {
  double a = 0;
  for (int i = 0; i < 4; ++i)
    a += p[i].x * p[(i + 1) % 4].y - p[(i + 1) % 4].x * p[i].y;
  if (a > 0) std::swap(p[1], p[3]);
}

double bev_overlap(const Box& a, const Box& b) {
  Pt ca[4], cb[4];
  bev_corners(a, ca);
  bev_corners(b, cb);
  make_cw(ca);
  make_cw(cb);
  std::vector<Pt> subject(ca, ca + 4);
  auto inter = clip_poly(subject, cb);
  if (inter.size() < 3) return 0.0;
  double ia = poly_area(inter);
  double ua = a.l * a.w + b.l * b.w - ia;
  return ua > 0 ? ia / ua : 0.0;
}

double box3d_overlap(const Box& a, const Box& b) {
  Pt ca[4], cb[4];
  bev_corners(a, ca);
  bev_corners(b, cb);
  make_cw(ca);
  make_cw(cb);
  std::vector<Pt> subject(ca, ca + 4);
  auto inter = clip_poly(subject, cb);
  if (inter.size() < 3) return 0.0;
  double ia = poly_area(inter);
  // y axis points down; box spans [ty - h, ty]
  double ymin = std::max(a.ty - a.h, b.ty - b.h);
  double ymax = std::min(a.ty, b.ty);
  double ih = std::max(0.0, ymax - ymin);
  double iv = ia * ih;
  double uv = a.l * a.w * a.h + b.l * b.w * b.h - iv;
  return uv > 0 ? iv / uv : 0.0;
}

enum Metric { kImage = 0, kGround = 1, kBox3D = 2 };

double overlap(const Box& a, const Box& b, Metric m) {
  switch (m) {
    case kImage:
      return box2d_iou(a, b);
    case kGround:
      return bev_overlap(a, b);
    default:
      return box3d_overlap(a, b);
  }
}

// -1: ignored, 0: valid, else skip entirely
int gt_relevance(const Box& g, int current_cls, int difficulty) {
  bool same = g.cls == current_cls;
  // neighbor classes ignored (Van~Car handled by caller mapping cls=-2,
  // Person_sitting~Pedestrian likewise); dontcare is cls == -1
  bool neighbor = (g.cls == -2 - current_cls);
  double height = g.y2 - g.y1;
  if (same) {
    if (g.occlusion > kMaxOcclusion[difficulty] ||
        g.truncation > kMaxTruncation[difficulty] ||
        height <= kMinHeight[difficulty])
      return -1;  // ignored
    return 0;
  }
  if (neighbor || g.cls == -1) return -1;
  return 1;  // irrelevant
}

struct ImageData {
  std::vector<Box> gts;
  std::vector<Box> dets;
};

struct PrPoint {
  double tp = 0, fp = 0, fn = 0, similarity = 0;
};

// score thresholds from the sorted TP candidate scores (official logic)
std::vector<double> thresholds_from_scores(std::vector<double> scores,
                                           double n_gt) {
  std::sort(scores.begin(), scores.end(), std::greater<double>());
  std::vector<double> th;
  double current_recall = 0;
  for (size_t i = 0; i < scores.size(); ++i) {
    double l_recall = (i + 1) / n_gt;
    double r_recall =
        (i < scores.size() - 1) ? (i + 2) / n_gt : l_recall;
    if ((r_recall - current_recall) < (current_recall - l_recall) &&
        i < scores.size() - 1)
      continue;
    th.push_back(scores[i]);
    current_recall += 1.0 / (kNSample - 1.0);
  }
  return th;
}

void eval_class(const std::vector<ImageData>& images, int cls,
                int difficulty, Metric metric, bool compute_aos,
                double* ap_out, double* aos_out) {
  double min_ov = metric == kImage ? kMinOverlap2D[cls] : kMinOverlap3D[cls];

  // pass 1: count valid GT + collect TP candidate scores
  double n_gt = 0;
  std::vector<double> tp_scores;
  for (const auto& img : images) {
    std::vector<int> rel(img.gts.size());
    for (size_t gi = 0; gi < img.gts.size(); ++gi) {
      rel[gi] = gt_relevance(img.gts[gi], cls, difficulty);
      if (rel[gi] == 0) n_gt += 1;
    }
    // greedy: each valid gt matched with the best-overlap detection
    for (size_t gi = 0; gi < img.gts.size(); ++gi) {
      if (rel[gi] != 0) continue;
      double best = min_ov;
      int bi = -1;
      for (size_t di = 0; di < img.dets.size(); ++di) {
        if (img.dets[di].cls != cls) continue;
        double ov = overlap(img.dets[di], img.gts[gi], metric);
        if (ov >= best) {
          best = ov;
          bi = (int)di;
        }
      }
      if (bi >= 0) tp_scores.push_back(img.dets[bi].score);
    }
  }
  if (n_gt == 0) {
    *ap_out = -1;
    if (aos_out) *aos_out = -1;
    return;
  }
  auto thresholds = thresholds_from_scores(tp_scores, n_gt);

  std::vector<PrPoint> pr(thresholds.size());
  for (const auto& img : images) {
    std::vector<int> rel(img.gts.size());
    for (size_t gi = 0; gi < img.gts.size(); ++gi)
      rel[gi] = gt_relevance(img.gts[gi], cls, difficulty);
    // small det height => ignored detection (avoids penalizing hard dets)
    std::vector<int> det_ign(img.dets.size(), 0);
    for (size_t di = 0; di < img.dets.size(); ++di) {
      double h = img.dets[di].y2 - img.dets[di].y1;
      if (h < kMinHeight[difficulty]) det_ign[di] = 1;
    }
    for (size_t t = 0; t < thresholds.size(); ++t) {
      double thr = thresholds[t];
      std::vector<char> det_used(img.dets.size(), 0);
      // match valid gts
      for (size_t gi = 0; gi < img.gts.size(); ++gi) {
        if (rel[gi] == 1) continue;  // irrelevant class
        double best_ov = min_ov;
        int bi = -1;
        bool bi_ignored = false;
        for (size_t di = 0; di < img.dets.size(); ++di) {
          if (img.dets[di].cls != cls || det_used[di]) continue;
          if (img.dets[di].score < thr) continue;
          double ov = overlap(img.dets[di], img.gts[gi], metric);
          if (ov >= best_ov) {
            // prefer non-ignored detections
            if (bi >= 0 && !bi_ignored && det_ign[di]) continue;
            best_ov = ov;
            bi = (int)di;
            bi_ignored = det_ign[di] != 0;
          }
        }
        if (bi >= 0) {
          det_used[bi] = 1;
          if (rel[gi] == 0 && !bi_ignored) {
            pr[t].tp += 1;
            if (compute_aos) {
              double delta = img.gts[gi].alpha - img.dets[bi].alpha;
              pr[t].similarity += (1.0 + std::cos(delta)) / 2.0;
            }
          }
          // matches to ignored gts or by ignored dets count neither way
        } else if (rel[gi] == 0) {
          pr[t].fn += 1;
        }
      }
      // unmatched, non-ignored detections above threshold are FPs
      for (size_t di = 0; di < img.dets.size(); ++di) {
        if (img.dets[di].cls != cls || det_used[di] || det_ign[di]) continue;
        if (img.dets[di].score < thr) continue;
        pr[t].fp += 1;
      }
    }
  }

  // precision curve over the 41 recall sample points
  std::vector<double> precision(kNSample, 0.0);
  std::vector<double> aos(kNSample, 0.0);
  for (size_t t = 0; t < thresholds.size(); ++t) {
    double denom = pr[t].tp + pr[t].fp;
    precision[t] = denom > 0 ? pr[t].tp / denom : 0;
    if (compute_aos) aos[t] = denom > 0 ? pr[t].similarity / denom : 0;
  }
  // monotone smoothing (official)
  for (int i = 0; i < kNSample; ++i) {
    for (int j = i; j < kNSample; ++j) {
      precision[i] = std::max(precision[i], precision[j]);
      if (compute_aos) aos[i] = std::max(aos[i], aos[j]);
    }
  }
  double sum_p = 0, sum_a = 0;
  for (int i = 0; i < kNSample; ++i) {
    sum_p += precision[i];
    sum_a += aos[i];
  }
  *ap_out = sum_p / kNSample * 100.0;
  if (aos_out) *aos_out = compute_aos ? sum_a / kNSample * 100.0 : -1;
}

}  // namespace

extern "C" {

// Flat record layout (doubles):
// [cls, x1, y1, x2, y2, h, w, l, tx, ty, tz, ry, alpha, score, occ, trunc]
constexpr int kRecord = 16;

// results layout: for each cls(3) x difficulty(3):
//   [ap2d, aos, ap_bev, ap_3d] => 36 doubles
int kitti_evaluate(const double* gt_data, const long* gt_counts,
                   const double* det_data, const long* det_counts,
                   long n_images, double* results) {
  std::vector<ImageData> images(n_images);
  long gofs = 0, dofs = 0;
  auto parse = [](const double* r) {
    Box b;
    b.cls = (int)r[0];
    b.x1 = r[1]; b.y1 = r[2]; b.x2 = r[3]; b.y2 = r[4];
    b.h = r[5]; b.w = r[6]; b.l = r[7];
    b.tx = r[8]; b.ty = r[9]; b.tz = r[10];
    b.ry = r[11]; b.alpha = r[12]; b.score = r[13];
    b.occlusion = (int)r[14]; b.truncation = r[15];
    return b;
  };
  for (long i = 0; i < n_images; ++i) {
    for (long g = 0; g < gt_counts[i]; ++g)
      images[i].gts.push_back(parse(gt_data + (gofs + g) * kRecord));
    gofs += gt_counts[i];
    for (long d = 0; d < det_counts[i]; ++d)
      images[i].dets.push_back(parse(det_data + (dofs + d) * kRecord));
    dofs += det_counts[i];
  }
  int idx = 0;
  for (int cls = 0; cls < 3; ++cls) {
    for (int dif = 0; dif < 3; ++dif) {
      double ap2d, aos, apbev, ap3d;
      eval_class(images, cls, dif, kImage, true, &ap2d, &aos);
      eval_class(images, cls, dif, kGround, false, &apbev, nullptr);
      eval_class(images, cls, dif, kBox3D, false, &ap3d, nullptr);
      results[idx++] = ap2d;
      results[idx++] = aos;
      results[idx++] = apbev;
      results[idx++] = ap3d;
    }
  }
  return 0;
}

}  // extern "C"
