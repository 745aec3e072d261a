// Host-side exact polygon IoU for the offline DOTA toolkit.
//
// Replaces the reference's SWIG-wrapped polyiou (DOTA_devkit/polyiou.cpp)
// with a plain C ABI loaded via ctypes: double-precision Sutherland-Hodgman
// convex clipping + shoelace areas.  Used by ResultMerge cross-tile NMS and
// the Task1/mAOE/HRSC evaluators where per-pair python overhead dominates.
//
// Build: python setup_native.py   (or: make -C csrc)

#include <algorithm>
#include <cmath>
#include <cstring>

namespace {

struct Pt {
  double x, y;
};

inline double signed_area(const Pt* p, int n) {
  double a = 0.0;
  for (int i = 0; i < n; ++i) {
    const Pt& u = p[i];
    const Pt& v = p[(i + 1) % n];
    a += u.x * v.y - v.x * u.y;
  }
  return 0.5 * a;
}

// Clip subject polygon by the half-plane left of edge (a -> b).
// Returns new vertex count; writes into out (capacity >= n + 1).
inline int clip_half_plane(const Pt* in, int n, Pt a, Pt b, Pt* out) {
  if (n == 0) return 0;
  const double ex = b.x - a.x, ey = b.y - a.y;
  int m = 0;
  Pt prev = in[n - 1];
  double prev_side = ex * (prev.y - a.y) - ey * (prev.x - a.x);
  for (int i = 0; i < n; ++i) {
    Pt cur = in[i];
    double cur_side = ex * (cur.y - a.y) - ey * (cur.x - a.x);
    if (cur_side >= 0) {
      if (prev_side < 0) {
        double t = prev_side / (prev_side - cur_side);
        out[m++] = {prev.x + t * (cur.x - prev.x),
                    prev.y + t * (cur.y - prev.y)};
      }
      out[m++] = cur;
    } else if (prev_side >= 0) {
      double t = prev_side / (prev_side - cur_side);
      out[m++] = {prev.x + t * (cur.x - prev.x),
                  prev.y + t * (cur.y - prev.y)};
    }
    prev = cur;
    prev_side = cur_side;
  }
  return m;
}

// IoU of two quads given as 8 doubles each (x0 y0 ... x3 y3).
double quad_iou(const double* q1, const double* q2) {
  Pt a[4], b[4];
  for (int i = 0; i < 4; ++i) {
    a[i] = {q1[2 * i], q1[2 * i + 1]};
    b[i] = {q2[2 * i], q2[2 * i + 1]};
  }
  // orient CCW
  if (signed_area(a, 4) < 0) std::swap(a[0], a[3]), std::swap(a[1], a[2]);
  if (signed_area(b, 4) < 0) std::swap(b[0], b[3]), std::swap(b[1], b[2]);

  // S-H clip a by the 4 edges of b; capacity grows by 1 per clip (<= 8)
  Pt buf1[16], buf2[16];
  std::memcpy(buf1, a, sizeof(a));
  int n = 4;
  Pt* src = buf1;
  Pt* dst = buf2;
  for (int e = 0; e < 4 && n > 0; ++e) {
    n = clip_half_plane(src, n, b[e], b[(e + 1) % 4], dst);
    std::swap(src, dst);
  }
  double inter = n >= 3 ? std::fabs(signed_area(src, n)) : 0.0;
  double a1 = std::fabs(signed_area(a, 4));
  double a2 = std::fabs(signed_area(b, 4));
  double uni = a1 + a2 - inter;
  return uni > 0 ? inter / uni : 0.0;
}

}  // namespace

extern "C" {

// Aligned pairs: out[i] = IoU(p1[i], p2[i]); each row is 8 doubles.
void poly_iou_pairs(const double* p1, const double* p2, int n, double* out) {
  for (int i = 0; i < n; ++i) out[i] = quad_iou(p1 + 8 * i, p2 + 8 * i);
}

// Full matrix: out[i * m + j] = IoU(p1[i], p2[j]).
void poly_iou_matrix(const double* p1, int n, const double* p2, int m,
                     double* out) {
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < m; ++j) out[i * m + j] = quad_iou(p1 + 8 * i, p2 + 8 * j);
}

// Greedy polygon NMS with HBB prefilter (py_cpu_nms_poly_fast semantics).
// dets: n rows of [x0 y0 ... x3 y3 score]; keep_out: caller-allocated int[n];
// returns the number of kept indices.
int poly_nms(const double* dets, int n, double thresh, int* keep_out) {
  if (n == 0) return 0;
  // precompute HBBs and score order
  double* x1 = new double[n];
  double* y1 = new double[n];
  double* x2 = new double[n];
  double* y2 = new double[n];
  double* area = new double[n];
  int* order = new int[n];
  bool* dead = new bool[n]();
  for (int i = 0; i < n; ++i) {
    const double* q = dets + 9 * i;
    x1[i] = std::min(std::min(q[0], q[2]), std::min(q[4], q[6]));
    x2[i] = std::max(std::max(q[0], q[2]), std::max(q[4], q[6]));
    y1[i] = std::min(std::min(q[1], q[3]), std::min(q[5], q[7]));
    y2[i] = std::max(std::max(q[1], q[3]), std::max(q[5], q[7]));
    area[i] = (x2[i] - x1[i] + 1) * (y2[i] - y1[i] + 1);
    order[i] = i;
  }
  std::sort(order, order + n, [&](int a, int b) {
    return dets[9 * a + 8] > dets[9 * b + 8];
  });
  int nkeep = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (dead[i]) continue;
    keep_out[nkeep++] = i;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (dead[j]) continue;
      double w = std::min(x2[i], x2[j]) - std::max(x1[i], x1[j]);
      double h = std::min(y2[i], y2[j]) - std::max(y1[i], y1[j]);
      if (w <= 0 || h <= 0) continue;
      double iou = quad_iou(dets + 9 * i, dets + 9 * j);
      if (iou > thresh) dead[j] = true;
    }
  }
  delete[] x1; delete[] y1; delete[] x2; delete[] y2;
  delete[] area; delete[] order; delete[] dead;
  return nkeep;
}

}  // extern "C"
