// Native asset-pipeline kernels — the C++ runtime side of the framework.
//
// The reference's entire engine is C++ (SURVEY.md §2); the TPU rebuild keeps the
// compute path in XLA/Pallas and moves the host-side heavy lifting here:
//   - BVH build (median-split ordering + complete-tree preorder flatten) — replaces the
//     Python-loop flatten in scene/bvh.py (~100x faster on Sponza-scale meshes).
//   - Area-weighted surface point-cloud sampling (mesh_storage.cpp:246-319 analog).
//
// Built as a plain shared library (tools/build_native.sh), bound via ctypes
// (androidrenderer_tpu/native.py). The array formats are bit-identical to the Python
// builders so either backend can serve the same callers.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr int kLeafSize = 4;

}  // namespace

extern "C" {

// Returns the number of nodes written (2P-1), or -1 on error. Output arrays must be
// sized for the worst case: nodes = 2 * next_pow2(ceil(n/4)) - 1, tri_order =
// next_pow2(ceil(n/4)) * 4.
int sah_build_bvh(const float* positions, int64_t num_vertices,
                  const int32_t* indices, int64_t num_tris, const uint8_t* valid,
                  float* node_min, float* node_max, int32_t* node_miss,
                  int32_t* node_first, int32_t* node_count, int32_t* tri_order) {
  (void)num_vertices;
  std::vector<int32_t> ids;
  ids.reserve(num_tris);
  for (int64_t t = 0; t < num_tris; ++t) {
    if (!valid || valid[t]) ids.push_back(static_cast<int32_t>(t));
  }
  const int64_t n = static_cast<int64_t>(ids.size());
  if (n == 0) return -1;

  std::vector<float> tmin(n * 3), tmax(n * 3), cent(n * 3);
  float clo[3] = {1e30f, 1e30f, 1e30f}, chi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < n; ++i) {
    const int32_t t = ids[i];
    for (int k = 0; k < 3; ++k) {
      const float a = positions[3 * indices[3 * t] + k];
      const float b = positions[3 * indices[3 * t + 1] + k];
      const float c = positions[3 * indices[3 * t + 2] + k];
      const float mn = std::min(a, std::min(b, c));
      const float mx = std::max(a, std::max(b, c));
      tmin[3 * i + k] = mn;
      tmax[3 * i + k] = mx;
      const float ce = 0.5f * (mn + mx);
      cent[3 * i + k] = ce;
      clo[k] = std::min(clo[k], ce);
      chi[k] = std::max(chi[k], ce);
    }
  }

  const int64_t num_leaves = std::max<int64_t>(1, (n + kLeafSize - 1) / kLeafSize);
  int depth = 0;
  while ((int64_t{1} << depth) < num_leaves) ++depth;
  const int64_t p = int64_t{1} << depth;

  // Recursive widest-axis median-split ordering onto the complete tree's
  // leaf capacity — EXACTLY the python builder's median_split_order
  // (scene/bvh.py): per segment, stable-sort by the centroid bounds' widest
  // axis (lowest axis index on ties) and split at half the slot capacity.
  // Replaced the round-3 Morton ordering (primary rays measured ~350-visit
  // medians on the bench scene; median splits follow the geometry).
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  {
    struct Seg {
      int64_t lo, hi, cap;
    };
    std::vector<Seg> segs;
    segs.push_back({0, n, p * kLeafSize});
    while (!segs.empty()) {
      const Seg sg = segs.back();
      segs.pop_back();
      const int64_t len = sg.hi - sg.lo;
      if (len <= kLeafSize || sg.cap <= kLeafSize) continue;
      const int64_t half = sg.cap / 2;
      if (len > half) {
        // SAH-axis rule (round 5, matches scene/bvh.py median_split_order
        // exactly, incl. f32 area expression order and strict-< ties):
        // try all 3 axes at the fixed capacity split, keep the one with
        // minimal area(left AABB) + area(right AABB).
        std::vector<int64_t> best_order, trial(order.begin() + sg.lo,
                                               order.begin() + sg.hi);
        float best_cost = 0.0f;
        bool have = false;
        for (int ax = 0; ax < 3; ++ax) {
          std::vector<int64_t> s(order.begin() + sg.lo, order.begin() + sg.hi);
          std::stable_sort(s.begin(), s.end(), [&](int64_t a, int64_t b) {
            return cent[3 * a + ax] < cent[3 * b + ax];
          });
          float cost = 0.0f;
          for (int side = 0; side < 2; ++side) {
            const int64_t s0 = side == 0 ? 0 : half;
            const int64_t s1 = side == 0 ? half : len;
            float lo3[3] = {1e30f, 1e30f, 1e30f};
            float hi3[3] = {-1e30f, -1e30f, -1e30f};
            for (int64_t i = s0; i < s1; ++i)
              for (int k = 0; k < 3; ++k) {
                lo3[k] = std::min(lo3[k], tmin[3 * s[i] + k]);
                hi3[k] = std::max(hi3[k], tmax[3 * s[i] + k]);
              }
            const float d0 = hi3[0] - lo3[0];
            const float d1 = hi3[1] - lo3[1];
            const float d2 = hi3[2] - lo3[2];
            cost += d0 * d1 + d1 * d2 + d2 * d0;
          }
          if (!have || cost < best_cost) {  // strict < keeps the lowest axis
            best_cost = cost;
            have = true;
            best_order = std::move(s);
          }
        }
        std::copy(best_order.begin(), best_order.end(), order.begin() + sg.lo);
      } else {
        // Everything fits the left half: membership is axis-independent,
        // but keep the legacy widest-extent sort so the RECURSION below
        // sees the same ordering as the python builder's fallback... the
        // python SAH path also skips the axis trial here (len <= half).
        float lo3[3] = {1e30f, 1e30f, 1e30f}, hi3[3] = {-1e30f, -1e30f, -1e30f};
        for (int64_t i = sg.lo; i < sg.hi; ++i)
          for (int k = 0; k < 3; ++k) {
            const float c = cent[3 * order[i] + k];
            lo3[k] = std::min(lo3[k], c);
            hi3[k] = std::max(hi3[k], c);
          }
        int ax = 0;
        float best = hi3[0] - lo3[0];
        for (int k = 1; k < 3; ++k) {
          const float e = hi3[k] - lo3[k];
          if (e > best) {  // strictly greater keeps the lowest axis on ties
            best = e;
            ax = k;
          }
        }
        std::stable_sort(order.begin() + sg.lo, order.begin() + sg.hi,
                         [&](int64_t a, int64_t b) {
                           return cent[3 * a + ax] < cent[3 * b + ax];
                         });
      }
      const int64_t mid = std::min(sg.lo + half, sg.hi);
      segs.push_back({mid, sg.hi, half});
      segs.push_back({sg.lo, mid, half});
    }
  }

  std::fill(tri_order, tri_order + p * kLeafSize, -1);
  for (int64_t i = 0; i < n; ++i) tri_order[i] = ids[order[i]];

  // Leaf AABBs + counts.
  std::vector<float> lmin(p * 3, 1e30f), lmax(p * 3, -1e30f);
  std::vector<int32_t> lcount(p, 0);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t leaf = i / kLeafSize;
    const int64_t src = order[i];
    for (int k = 0; k < 3; ++k) {
      lmin[3 * leaf + k] = std::min(lmin[3 * leaf + k], tmin[3 * src + k]);
      lmax[3 * leaf + k] = std::max(lmax[3 * leaf + k], tmax[3 * src + k]);
    }
    lcount[leaf]++;
  }

  // Bottom-up internal levels; level 0 = leaves.
  std::vector<std::vector<float>> lvl_min{lmin}, lvl_max{lmax};
  while (static_cast<int64_t>(lvl_min.back().size() / 3) > 1) {
    const auto& cm = lvl_min.back();
    const auto& cx = lvl_max.back();
    const int64_t m = static_cast<int64_t>(cm.size() / 3) / 2;
    std::vector<float> nm(m * 3), nx2(m * 3);
    for (int64_t i = 0; i < m; ++i)
      for (int k = 0; k < 3; ++k) {
        nm[3 * i + k] = std::min(cm[6 * i + k], cm[6 * i + 3 + k]);
        nx2[3 * i + k] = std::max(cx[6 * i + k], cx[6 * i + 3 + k]);
      }
    lvl_min.push_back(std::move(nm));
    lvl_max.push_back(std::move(nx2));
  }
  const int levels = static_cast<int>(lvl_min.size());
  const int64_t m_total = 2 * p - 1;

  // Iterative preorder emission with explicit stack.
  struct Item {
    int lvl;
    int64_t idx;
    int64_t slot;
    int64_t miss;
  };
  std::vector<Item> stack;
  stack.push_back({levels - 1, 0, 0, m_total});
  while (!stack.empty()) {
    const Item it = stack.back();
    stack.pop_back();
    for (int k = 0; k < 3; ++k) {
      node_min[3 * it.slot + k] = lvl_min[it.lvl][3 * it.idx + k];
      node_max[3 * it.slot + k] = lvl_max[it.lvl][3 * it.idx + k];
    }
    node_miss[it.slot] = static_cast<int32_t>(it.miss);
    if (it.lvl == 0) {
      node_first[it.slot] = static_cast<int32_t>(it.idx * kLeafSize);
      node_count[it.slot] = lcount[it.idx];
    } else {
      node_first[it.slot] = -1;
      node_count[it.slot] = 0;
      const int64_t left_size = (int64_t{1} << it.lvl) - 1;
      const int64_t left_slot = it.slot + 1;
      const int64_t right_slot = it.slot + 1 + left_size;
      stack.push_back({it.lvl - 1, it.idx * 2 + 1, right_slot, it.miss});
      stack.push_back({it.lvl - 1, it.idx * 2, left_slot, right_slot});
    }
  }
  return static_cast<int>(m_total);
}

// Area-weighted surface sampling (mesh_storage.cpp:246-319 analog): k points with
// positions+normals into out (k x 6). Deterministic xorshift RNG seeded by `seed`.
int sah_sample_surface(const float* positions, int64_t num_vertices,
                       const int32_t* indices, int64_t num_tris, float area_per_sample,
                       int32_t max_points, uint64_t seed, float* out) {
  (void)num_vertices;
  std::vector<double> cum(num_tris);
  double total = 0.0;
  std::vector<float> fnorm(num_tris * 3);
  for (int64_t t = 0; t < num_tris; ++t) {
    const float* a = positions + 3 * indices[3 * t];
    const float* b = positions + 3 * indices[3 * t + 1];
    const float* c = positions + 3 * indices[3 * t + 2];
    float e1[3], e2[3], cr[3];
    for (int k = 0; k < 3; ++k) {
      e1[k] = b[k] - a[k];
      e2[k] = c[k] - a[k];
    }
    cr[0] = e1[1] * e2[2] - e1[2] * e2[1];
    cr[1] = e1[2] * e2[0] - e1[0] * e2[2];
    cr[2] = e1[0] * e2[1] - e1[1] * e2[0];
    const double len = std::sqrt(double(cr[0]) * cr[0] + double(cr[1]) * cr[1] +
                                 double(cr[2]) * cr[2]);
    total += 0.5 * len;
    cum[t] = total;
    const double inv = len > 1e-20 ? 1.0 / len : 0.0;
    for (int k = 0; k < 3; ++k) fnorm[3 * t + k] = static_cast<float>(cr[k] * inv);
  }
  if (total <= 0.0) return 0;
  int64_t kpts = std::min<int64_t>(
      max_points, std::max<int64_t>(1, static_cast<int64_t>(total / area_per_sample)));

  uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ull;
  auto rnd = [&]() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return (s >> 11) * (1.0 / 9007199254740992.0);
  };
  for (int64_t i = 0; i < kpts; ++i) {
    const double u = rnd() * total;
    const int64_t t =
        std::lower_bound(cum.begin(), cum.end(), u) - cum.begin();
    const int64_t tt = std::min<int64_t>(t, num_tris - 1);
    const float* a = positions + 3 * indices[3 * tt];
    const float* b = positions + 3 * indices[3 * tt + 1];
    const float* c = positions + 3 * indices[3 * tt + 2];
    const double r1 = std::sqrt(rnd());
    const double r2 = rnd();
    const double wa = 1.0 - r1, wb = r1 * (1.0 - r2), wc = r1 * r2;
    for (int k = 0; k < 3; ++k)
      out[6 * i + k] = static_cast<float>(wa * a[k] + wb * b[k] + wc * c[k]);
    for (int k = 0; k < 3; ++k) out[6 * i + 3 + k] = fnorm[3 * tt + k];
  }
  return static_cast<int>(kpts);
}

}  // extern "C"
