// Native point-cloud outlier filters: statistical (SOR) + radius removal.
//
// C++ counterpart of the reference wrapper's PCL post-processing chain
// (/root/reference/src/imu_mono_realsense.cpp:189-213:
// StatisticalOutlierRemoval meanK=100 stddev=0.1 followed by
// RadiusOutlierRemoval radius=0.1 minNeighbors=5), here over a small
// static KD-tree instead of linking PCL. Exposed via the same C ABI /
// ctypes route as the feeder (no pybind11 in this image). Semantics match
// runtime/outputs.filter_point_cloud exactly: SOR mean distance over the
// min(meanK+1, n)-1 nearest non-self neighbors, population-std threshold,
// then a radius count (including self) >= minNeighbors+1 on the survivors.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <queue>
#include <vector>

namespace {

struct KDTree {
  // implicit balanced tree over point indices (nth_element build)
  const float* pts;  // (n, 3)
  std::vector<int> idx;
  std::vector<int> axis;  // split axis per tree node position

  explicit KDTree(const float* p, int n) : pts(p), idx(n), axis(n, -1) {
    std::iota(idx.begin(), idx.end(), 0);
    build(0, n, 0);
  }

  void build(int lo, int hi, int depth) {
    if (hi - lo <= 1) return;
    int mid = (lo + hi) / 2;
    int ax = depth % 3;
    std::nth_element(
        idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
        [&](int a, int b) { return pts[3 * a + ax] < pts[3 * b + ax]; });
    axis[mid] = ax;
    build(lo, mid, depth + 1);
    build(mid + 1, hi, depth + 1);
  }

  // k nearest neighbors (excluding `self`), max-heap of squared distances
  void knn(const float* q, int self, int k,
           std::priority_queue<float>* heap) const {
    knn_rec(q, self, k, 0, static_cast<int>(idx.size()), 0, heap);
  }

  void knn_rec(const float* q, int self, int k, int lo, int hi, int depth,
               std::priority_queue<float>* heap) const {
    if (hi <= lo) return;
    int mid = (lo + hi) / 2;
    int pi = idx[mid];
    if (pi != self) {
      float d2 = 0;
      for (int c = 0; c < 3; ++c) {
        float d = q[c] - pts[3 * pi + c];
        d2 += d * d;
      }
      if (static_cast<int>(heap->size()) < k) {
        heap->push(d2);
      } else if (d2 < heap->top()) {
        heap->pop();
        heap->push(d2);
      }
    }
    if (hi - lo == 1) return;
    int ax = depth % 3;
    float delta = q[ax] - pts[3 * pi + ax];
    int first_lo = delta < 0;
    for (int pass = 0; pass < 2; ++pass) {
      bool go_lo = (pass == 0) == (first_lo != 0);
      float plane2 = delta * delta;
      bool full = static_cast<int>(heap->size()) >= k;
      if (pass == 1 && full && plane2 > heap->top()) continue;
      if (go_lo)
        knn_rec(q, self, k, lo, mid, depth + 1, heap);
      else
        knn_rec(q, self, k, mid + 1, hi, depth + 1, heap);
    }
  }

  // count of points within radius r of q, including q itself
  int radius_count(const float* q, float r2, int lo, int hi,
                   int depth) const {
    if (hi <= lo) return 0;
    int mid = (lo + hi) / 2;
    int pi = idx[mid];
    float d2 = 0;
    for (int c = 0; c < 3; ++c) {
      float d = q[c] - pts[3 * pi + c];
      d2 += d * d;
    }
    int cnt = d2 <= r2 ? 1 : 0;
    if (hi - lo == 1) return cnt;
    int ax = depth % 3;
    float delta = q[ax] - pts[3 * pi + ax];
    if (delta < 0 || delta * delta <= r2)
      cnt += radius_count(q, r2, lo, mid, depth + 1);
    if (delta >= 0 || delta * delta <= r2)
      cnt += radius_count(q, r2, mid + 1, hi, depth + 1);
    return cnt;
  }
};

}  // namespace

extern "C" {

// SOR + radius removal. pts: (n, 3) float32. keep_out: (n,) uint8 mask of
// points surviving BOTH stages. Returns the number kept (or -1 on error).
int pcl_filter(const float* pts, int n, int mean_k, float sor_stddev,
               float radius, int min_neighbors, uint8_t* keep_out) {
  if (n <= 0) return 0;
  std::fill(keep_out, keep_out + n, 0);

  // ---- stage 1: statistical outlier removal ----
  KDTree tree(pts, n);
  int k = std::min(mean_k + 1, n) - 1;  // non-self neighbors averaged
  std::vector<double> mean_d(n, 0.0);
  if (k > 0) {
    for (int i = 0; i < n; ++i) {
      std::priority_queue<float> heap;
      tree.knn(pts + 3 * i, i, k, &heap);
      double s = 0.0;
      while (!heap.empty()) {
        s += std::sqrt(static_cast<double>(heap.top()));
        heap.pop();
      }
      mean_d[i] = s / k;
    }
  }
  double mu = 0.0;
  for (int i = 0; i < n; ++i) mu += mean_d[i];
  mu /= n;
  double var = 0.0;
  for (int i = 0; i < n; ++i) var += (mean_d[i] - mu) * (mean_d[i] - mu);
  double thr = mu + sor_stddev * std::sqrt(var / n);  // population std

  std::vector<int> survivors;
  survivors.reserve(n);
  std::vector<float> spts;
  for (int i = 0; i < n; ++i) {
    if (mean_d[i] <= thr) {
      survivors.push_back(i);
      spts.insert(spts.end(), pts + 3 * i, pts + 3 * i + 3);
    }
  }
  if (survivors.empty()) return 0;

  // ---- stage 2: radius outlier removal on the survivors ----
  int m = static_cast<int>(survivors.size());
  KDTree tree2(spts.data(), m);
  float r2 = radius * radius;
  int kept = 0;
  for (int j = 0; j < m; ++j) {
    int cnt = tree2.radius_count(spts.data() + 3 * j, r2, 0, m, 0);
    if (cnt >= min_neighbors + 1) {  // count includes self
      keep_out[survivors[j]] = 1;
      ++kept;
    }
  }
  return kept;
}

}  // extern "C"
