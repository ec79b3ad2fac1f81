// Native GridPack (sparse-conv rulebook) builder.
//
// TPU-native equivalent of spconv's native pair-table construction
// (reference dependency spconv-cu120, SURVEY.md §2b): runs on the HOST inside
// the input pipeline, overlapped with device compute. Semantics are identical
// to unidet3d_tpu/ops/gridpack.py::build_gridpack_numpy (which mirrors the
// pure-XLA device path): voxels sorted by packed (batch,x,y,z) keys, capacity
// overflow dropped, 27-offset submanifold neighbor tables via binary search,
// downsample transitions via unique-of-halved-coords.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//        rulebook.cc -o libunidet3d_rulebook.so
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int64_t kInvalidKey = INT64_MAX;

inline int64_t pack(int64_t b, int64_t x, int64_t y, int64_t z) {
  return (b << 36) | (x << 24) | (y << 12) | z;
}

template <typename F>
void pfor(int64_t n, int n_threads, F f) {
  if (n_threads <= 1 || n < 4096) {
    for (int64_t i = 0; i < n; ++i) f(i);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) f(i);
    });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Outputs must be preallocated by the caller:
//   point_inverse: n_points int32
//   counts0: capacities[0] float
//   valids[l]: capacities[l] uint8            (l in [0, n_levels))
//   neighbors[l]: capacities[l] * 27 int32
//   parents[t]: capacities[t] int32           (t in [0, n_levels-1))
//   offsets[t]: capacities[t] int32
void unidet3d_build_gridpack(
    const int32_t* bxyz, const uint8_t* valid, int64_t n_points,
    const int64_t* capacities, int32_t n_levels, int32_t n_threads,
    int32_t* point_inverse, float* counts0, uint8_t** valids,
    int32_t** neighbors, int32_t** parents, int32_t** offsets) {
  // ---- Level 0: sort + dedup points.
  std::vector<int64_t> keys(n_points);
  pfor(n_points, n_threads, [&](int64_t i) {
    if (!valid[i]) {
      keys[i] = kInvalidKey;
      return;
    }
    int64_t b = bxyz[i * 4 + 0];
    int64_t x = std::clamp<int64_t>(bxyz[i * 4 + 1], 0, 4095);
    int64_t y = std::clamp<int64_t>(bxyz[i * 4 + 2], 0, 4095);
    int64_t z = std::clamp<int64_t>(bxyz[i * 4 + 3], 0, 4095);
    keys[i] = pack(b, x, y, z);
  });

  std::vector<int64_t> order(n_points);
  for (int64_t i = 0; i < n_points; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return keys[a] < keys[b];
  });

  const int64_t cap0 = capacities[0];
  std::vector<int64_t> lvl_keys;  // sorted unique keys of current level
  lvl_keys.reserve(cap0);
  std::memset(counts0, 0, sizeof(float) * cap0);

  int64_t prev = kInvalidKey;
  int64_t vox = -1;
  for (int64_t r = 0; r < n_points; ++r) {
    int64_t i = order[r];
    int64_t k = keys[i];
    if (k == kInvalidKey) {
      point_inverse[i] = static_cast<int32_t>(cap0);
      continue;
    }
    if (k != prev) {
      ++vox;
      prev = k;
      if (vox < cap0) lvl_keys.push_back(k);
    }
    if (vox < cap0) {
      point_inverse[i] = static_cast<int32_t>(vox);
      counts0[vox] += 1.0f;
    } else {
      point_inverse[i] = static_cast<int32_t>(cap0);  // overflow dropped
    }
  }

  // ---- Per level: neighbors + downsample transition.
  static const int d[27][3] = {
      {-1, -1, -1}, {-1, -1, 0}, {-1, -1, 1}, {-1, 0, -1}, {-1, 0, 0},
      {-1, 0, 1},   {-1, 1, -1}, {-1, 1, 0},  {-1, 1, 1},  {0, -1, -1},
      {0, -1, 0},   {0, -1, 1},  {0, 0, -1},  {0, 0, 0},   {0, 0, 1},
      {0, 1, -1},   {0, 1, 0},   {0, 1, 1},   {1, -1, -1}, {1, -1, 0},
      {1, -1, 1},   {1, 0, -1},  {1, 0, 0},   {1, 0, 1},   {1, 1, -1},
      {1, 1, 0},    {1, 1, 1}};

  for (int32_t lvl = 0; lvl < n_levels; ++lvl) {
    const int64_t cap = capacities[lvl];
    const int64_t cur_n = static_cast<int64_t>(lvl_keys.size());
    uint8_t* vl = valids[lvl];
    pfor(cap, n_threads, [&](int64_t i) { vl[i] = i < cur_n; });

    int32_t* nbr = neighbors[lvl];
    pfor(cap * 27, n_threads,
         [&](int64_t i) { nbr[i] = static_cast<int32_t>(cap); });
    const int64_t* kptr = lvl_keys.data();
    pfor(cur_n, n_threads, [&](int64_t i) {
      int64_t k = kptr[i];
      int64_t b = k >> 36, x = (k >> 24) & 4095, y = (k >> 12) & 4095,
              z = k & 4095;
      for (int o = 0; o < 27; ++o) {
        int64_t qx = x + d[o][0], qy = y + d[o][1], qz = z + d[o][2];
        if (qx < 0 || qx > 4095 || qy < 0 || qy > 4095 || qz < 0 || qz > 4095)
          continue;
        if (o == 13) {  // center = self
          nbr[i * 27 + o] = static_cast<int32_t>(i);
          continue;
        }
        int64_t qk = pack(b, qx, qy, qz);
        const int64_t* it = std::lower_bound(kptr, kptr + cur_n, qk);
        if (it != kptr + cur_n && *it == qk)
          nbr[i * 27 + o] = static_cast<int32_t>(it - kptr);
      }
    });

    if (lvl == n_levels - 1) break;

    // Downsample: parent keys (halved coords), unique preserving sort order.
    const int64_t ncap = capacities[lvl + 1];
    std::vector<int64_t> pk(cur_n);
    pfor(cur_n, n_threads, [&](int64_t i) {
      int64_t k = kptr[i];
      pk[i] = pack(k >> 36, ((k >> 24) & 4095) >> 1, ((k >> 12) & 4095) >> 1,
                   (k & 4095) >> 1);
    });
    // pk is NOT sorted in general; build sorted unique list.
    std::vector<int64_t> uniq(pk);
    std::sort(uniq.begin(), uniq.end());
    uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
    int64_t nn = std::min<int64_t>(static_cast<int64_t>(uniq.size()), ncap);

    int32_t* par = parents[lvl];
    int32_t* off = offsets[lvl];
    pfor(cap, n_threads, [&](int64_t i) {
      par[i] = static_cast<int32_t>(ncap);
      off[i] = 0;
    });
    const int64_t* uptr = uniq.data();
    pfor(cur_n, n_threads, [&](int64_t i) {
      const int64_t* it =
          std::lower_bound(uptr, uptr + uniq.size(), pk[i]);
      int64_t j = it - uptr;
      par[i] = static_cast<int32_t>(j < ncap ? j : ncap);
      int64_t k = kptr[i];
      int64_t x = (k >> 24) & 4095, y = (k >> 12) & 4095, z = k & 4095;
      off[i] = static_cast<int32_t>((x & 1) * 4 + (y & 1) * 2 + (z & 1));
    });

    uniq.resize(nn);
    lvl_keys = std::move(uniq);
  }
}

}  // extern "C"
