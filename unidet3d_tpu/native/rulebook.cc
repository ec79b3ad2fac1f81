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
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int64_t kInvalidKey = INT64_MAX;

inline int64_t pack(int64_t b, int64_t x, int64_t y, int64_t z) {
  return (b << 36) | (x << 24) | (y << 12) | z;
}

// min_serial: stay single-threaded below this n. The default suits
// cheap per-item bodies (sentinel writes); loops whose ITERATIONS are
// heavy (per-block banded build, per-offset neighbor merges) pass a
// small value so they parallelise even at n in the tens-to-thousands.
template <typename F>
void pfor(int64_t n, int n_threads, F f, int64_t min_serial = 4096) {
  if (n_threads <= 1 || n < min_serial) {
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
    // Padding rows keep the sentinel everywhere; real rows are fully
    // written by the per-offset merge below.
    pfor((cap - cur_n) * 27, n_threads, [&](int64_t i) {
      nbr[cur_n * 27 + i] = static_cast<int32_t>(cap);
    });
    const int64_t* kptr = lvl_keys.data();
    // Per offset, query keys qk(i) = k(i) + D_o are monotone in i (keys
    // are sorted and D_o is a constant where coords stay in range), so a
    // single two-pointer MERGE replaces cur_n binary searches — the
    // dominant cost of this builder on 131k-voxel scenes.
    pfor(
        27, n_threads,
        [&](int64_t o) {  // heavy per-iteration: O(cur_n)
      if (o == 13) {  // center = self
        for (int64_t i = 0; i < cur_n; ++i)
          nbr[i * 27 + o] = static_cast<int32_t>(i);
        return;
      }
      // Arithmetic, not bitwise: deltas are signed (-1/0/+1 per field).
      const int64_t dk = static_cast<int64_t>(d[o][0]) * (1LL << 24) +
                         static_cast<int64_t>(d[o][1]) * (1LL << 12) +
                         static_cast<int64_t>(d[o][2]);
      int64_t j = 0;
      for (int64_t i = 0; i < cur_n; ++i) {
        int64_t k = kptr[i];
        int64_t x = (k >> 24) & 4095, y = (k >> 12) & 4095, z = k & 4095;
        int64_t qx = x + d[o][0], qy = y + d[o][1], qz = z + d[o][2];
        if (qx < 0 || qx > 4095 || qy < 0 || qy > 4095 || qz < 0 ||
            qz > 4095) {
          nbr[i * 27 + o] = static_cast<int32_t>(cap);
          continue;
        }
        // In-range field adds never carry across pack fields, so
        // qk == pack(b, qx, qy, qz); qk is strictly increasing over the
        // in-range subset, so j only ever advances.
        const int64_t qk = k + dk;
        while (j < cur_n && kptr[j] < qk) ++j;
        nbr[i * 27 + o] = static_cast<int32_t>(
            (j < cur_n && kptr[j] == qk) ? j : cap);
      }
    }, /*min_serial=*/1);

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

// Two-level banded rulebook for ONE level's subm conv (bit-exact twin of
// ops/pallas_conv.py::build_banded_rulebook + build_miss_list; see there
// for the semantics). The numpy version costs ~0.7 s per 131k-voxel scene
// — this is the input-pipeline hot path, so it runs here multithreaded.
//
//   neighbors: (V, 27) int32 row-major, sentinel = capacity; V = nb*block.
//   windows: (3,) per-GROUP DMA widths — the 27 offsets form 3 dx-slab
//   groups of 9 (o / 9) sharing one window each (grouped-window kernel).
//   wsubs: (27,) per-offset onehot widths, pre-clamped to group windows.
//   align: bases/sub_offs rounded DOWN to this multiple (16, or 16*p for
//   channel-packed kernels — see ops/pallas_conv.py choose_pack).
//   Outputs preallocated: bases (nb,3) GROUP bases, sub_offs
//   (nb,n_sub,27), rel (27,V) K-major, active (nb,), miss_{rows,nbrs,offs}
//   (miss_cap,) padded with 2^30 / 2^30 / 0. *n_miss = total misses BEFORE
//   truncation.
void unidet3d_build_banded(
    const int32_t* neighbors, int64_t v, int64_t capacity, int64_t block,
    const int64_t* windows, const int64_t* wsubs, int64_t n_sub,
    int64_t miss_cap, int64_t align, int32_t n_threads, int32_t* bases,
    int32_t* sub_offs, int32_t* rel, int32_t* active, int32_t* miss_rows,
    int32_t* miss_nbrs, int32_t* miss_offs, int64_t* n_miss) {
  const int64_t nb = v / block;
  const int64_t sub_rows = block / n_sub;
  const int32_t kInt32Max = INT32_MAX;
  constexpr int kGrp = 9;   // offsets per shared-window group (dx slab)
  constexpr int kNGrp = 3;  // 27 / kGrp
  // Per-block miss lists, concatenated + ordered afterwards.
  std::vector<std::vector<int64_t>> block_miss(nb);  // packed (o<<40 | row)

  // Heavy per-iteration (27 offsets x block rows): thread at any nb.
  pfor(nb, n_threads, [&](int64_t kb) {
    const int32_t* nb_ptr = neighbors + kb * block * 27;
    int32_t any_valid = 0;
    // Group bases: min valid neighbor over the block AND the group's 9
    // offsets, INT_MAX->0, clamp, align down.
    int64_t gbase[kNGrp];
    for (int g = 0; g < kNGrp; ++g) {
      int32_t mn = kInt32Max;
      for (int64_t r = 0; r < block; ++r) {
        for (int o = g * kGrp; o < (g + 1) * kGrp; ++o) {
          int32_t idx = nb_ptr[r * 27 + o];
          if (idx < capacity && idx < mn) mn = idx;
        }
      }
      if (mn != kInt32Max) any_valid = 1;
      int64_t base = (mn == kInt32Max) ? 0 : mn;
      base = std::min<int64_t>(base, std::max<int64_t>(capacity - 1, 0));
      base -= base % align;
      gbase[g] = base;
      bases[kb * kNGrp + g] = static_cast<int32_t>(base);
    }
    for (int o = 0; o < 27; ++o) {
      const int64_t base = gbase[o / kGrp];
      const int64_t w = windows[o / kGrp], ws = wsubs[o];
      int64_t lim = std::max<int64_t>(w - ws, 0);
      lim -= lim % align;  // clamped offsets must stay aligned
      for (int64_t sg = 0; sg < n_sub; ++sg) {
        // Subgroup base -> aligned offset into the group window
        // (floor-mod, matching numpy's sign semantics), clipped to
        // [0, lim].
        int32_t smn = kInt32Max;
        for (int64_t r = sg * sub_rows; r < (sg + 1) * sub_rows; ++r) {
          int32_t idx = nb_ptr[r * 27 + o];
          if (idx < capacity && idx < smn) smn = idx;
        }
        int64_t soff = ((smn == kInt32Max) ? 0 : smn) - base;
        soff -= ((soff % align) + align) % align;
        soff = std::clamp<int64_t>(soff, 0, lim);
        const int64_t shift = base + soff;
        bool any_in_band = false;
        for (int64_t r = sg * sub_rows; r < (sg + 1) * sub_rows; ++r) {
          const int64_t row = kb * block + r;
          int32_t idx = nb_ptr[r * 27 + o];
          bool val = idx < capacity;
          int64_t rv = idx - shift;
          bool in_band = val && rv >= 0 && rv < ws;
          any_in_band |= in_band;
          rel[o * v + row] = in_band ? static_cast<int32_t>(rv) : -1;
          if (val && !in_band)
            block_miss[kb].push_back((static_cast<int64_t>(o) << 40) | row);
        }
        // -16 sentinel: no in-band entry -> kernel skips the subgroup
        // (and the whole group DMA when every (offset, subgroup) is
        // empty).
        sub_offs[(kb * n_sub + sg) * 27 + o] =
            any_in_band ? static_cast<int32_t>(soff) : -16;
      }
    }
    active[kb] = any_valid;
  }, /*min_serial=*/1);

  // Misses ordered by (offset, row) to match np.nonzero on the (K, V) table.
  std::vector<int64_t> all;
  for (auto& bm : block_miss) all.insert(all.end(), bm.begin(), bm.end());
  std::sort(all.begin(), all.end());
  *n_miss = static_cast<int64_t>(all.size());
  const int64_t kept = std::min<int64_t>(*n_miss, miss_cap);
  for (int64_t m = 0; m < miss_cap; ++m) {
    if (m < kept) {
      int64_t o = all[m] >> 40, row = all[m] & ((1LL << 40) - 1);
      miss_rows[m] = static_cast<int32_t>(row);
      miss_nbrs[m] = neighbors[row * 27 + o];
      miss_offs[m] = static_cast<int32_t>(o);
    } else {
      miss_rows[m] = 1 << 30;
      miss_nbrs[m] = 1 << 30;
      miss_offs[m] = 0;
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// FUSED builder: quantize + gridpack + per-level banded rulebooks in ONE
// pass, never materialising the (V, 27) neighbor tables (unless asked).
//
// Motivation (round 5): the two-phase flow (build_gridpack -> per-level
// build_banded) writes ~110 MB of neighbor tables only for build_banded to
// re-read them into banded form — on the single-core hosts the input
// pipeline runs on, that memory traffic WAS the pipeline. Here each
// 512-row block's 27 neighbor columns are produced into a ~55 KB scratch
// (27 two-pointer merge streams, re-anchored per block by binary search so
// blocks parallelise) and consumed for banded emission while still in L1/L2.
// Bit-exact with the two-phase flow (tests/test_native_rulebook.py).
// ---------------------------------------------------------------------------

namespace {

// LSD radix sort of (key, payload) pairs by the low 48 key bits. Valid keys
// use <= 36 + 12 bits (batch << 36 | x << 24 | y << 12 | z, batch < 4096);
// kInvalidKey's low 48 bits are all ones, so invalids sort last, and the
// per-digit counting scatter is stable — matching std::stable_sort /
// np.argsort(kind='stable') on the same keys.
void radix_sort_pairs(std::vector<int64_t>& keys, std::vector<int32_t>& idx) {
  const int64_t n = static_cast<int64_t>(keys.size());
  std::vector<int64_t> kbuf(n);
  std::vector<int32_t> ibuf(n);
  int64_t* ksrc = keys.data();
  int64_t* kdst = kbuf.data();
  int32_t* isrc = idx.data();
  int32_t* idst = ibuf.data();
  for (int pass = 0; pass < 6; ++pass) {
    const int shift = pass * 8;
    int64_t count[256] = {0};
    for (int64_t i = 0; i < n; ++i) ++count[(ksrc[i] >> shift) & 255];
    int64_t pos[256];
    int64_t run = 0;
    for (int b = 0; b < 256; ++b) {
      pos[b] = run;
      run += count[b];
    }
    for (int64_t i = 0; i < n; ++i) {
      int64_t at = pos[(ksrc[i] >> shift) & 255]++;
      kdst[at] = ksrc[i];
      idst[at] = isrc[i];
    }
    std::swap(ksrc, kdst);
    std::swap(isrc, idst);
  }
  // 6 passes = even number of swaps: results are back in keys/idx.
}

}  // namespace

extern "C" {

// One-call fused pack build. Layout contracts match the two-phase entries;
// per-level banded outputs additionally match unidet3d_build_banded run on
// the level's (cap, 27) neighbor table. rel is emitted as int16 (the wire
// dtype: values are in [-1, wsub), wsub <= 4095) — the device casts.
//
//   vox_src: (n_scenes, p, 3) float32 voxel-unit coords
//   valid:   (n_scenes, p) uint8
//   blocks/n_subs/aligns/miss_caps: (L,) int64; windows (L, 3); wsubs (L, 27)
//   miss_caps = TRANSPORT lengths (two tiers concatenated, python reshapes)
//   want_neighbors != 0: also fill neighbors[l] (cap_l, 27) int32
//   pack_rel != 0: rel_out[l] is reinterpreted as an int32 buffer of shape
//     (27, nb * ceil(block/3)) holding 9-BIT PACKED entries e = rel + 1
//     (3 per word, lane i at bits [9i, 9i+9); e = 0 <=> rel = -1, so
//     zero-initialised padding IS the sentinel). Block-padded so threads
//     never share a word. Shrinks the wire form 16 -> ~10.7 bits/entry —
//     rel is the largest transport leaf (data/wire.py).
//   n_miss: (L,) int64 out — total misses per level BEFORE truncation.
void unidet3d_build_packs_fused(
    const float* vox_src, const uint8_t* valid, int64_t n_scenes, int64_t p,
    const int64_t* capacities, int32_t n_levels, int32_t n_threads,
    const int64_t* blocks, const int64_t* windows, const int64_t* wsubs,
    const int64_t* n_subs, const int64_t* miss_caps, const int64_t* aligns,
    int32_t want_neighbors, int32_t pack_rel, int32_t* point_inverse,
    float* counts0, uint8_t** valids, int32_t** parents, int32_t** offsets,
    int32_t** neighbors, int32_t** bases, int32_t** sub_offs_out,
    int16_t** rel_out, int32_t** active_out, int32_t** miss_rows,
    int32_t** miss_nbrs, int32_t** miss_offs, int64_t* n_miss) {
  // Phase profiling (UNIDET3D_RULEBOOK_PROFILE=1): stderr wall times; the
  // fused builder is the input pipeline's dominant host cost, so knowing
  // which phase to attack matters more than a few ns of timer overhead.
  const bool prof = std::getenv("UNIDET3D_RULEBOOK_PROFILE") != nullptr;
  auto tick = std::chrono::steady_clock::now();
  auto lap = [&](const char* name) {
    if (!prof) return;
    auto now = std::chrono::steady_clock::now();
    fprintf(stderr, "[rulebook] %-16s %7.1f ms\n", name,
            std::chrono::duration<double, std::milli>(now - tick).count());
    tick = now;
  };
  const int64_t n_points = n_scenes * p;
  // ---- Quantize (twin of ops/gridpack.py::quantize_points): per-scene
  // float32 min over valid points, floor, clamp to the 12-bit key fields.
  std::vector<int64_t> keys(n_points);
  std::vector<int32_t> order(n_points);
  pfor(n_scenes, n_threads, [&](int64_t s) {
    float pmin[3] = {1e9f, 1e9f, 1e9f};
    const float* v = vox_src + s * p * 3;
    const uint8_t* va = valid + s * p;
    for (int64_t i = 0; i < p; ++i) {
      if (!va[i]) continue;
      for (int a = 0; a < 3; ++a) pmin[a] = std::min(pmin[a], v[i * 3 + a]);
    }
    for (int a = 0; a < 3; ++a)
      if (pmin[a] >= 1e9f) pmin[a] = 0.0f;
    for (int64_t i = 0; i < p; ++i) {
      if (!va[i]) {
        keys[s * p + i] = kInvalidKey;
        continue;
      }
      int64_t c[3];
      for (int a = 0; a < 3; ++a) {
        float d = std::floor(v[i * 3 + a] - pmin[a]);
        c[a] = std::clamp<int64_t>(static_cast<int64_t>(d), 0, 4095);
      }
      keys[s * p + i] = pack(s, c[0], c[1], c[2]);
    }
  }, /*min_serial=*/1);
  lap("quantize");
  for (int64_t i = 0; i < n_points; ++i) order[i] = static_cast<int32_t>(i);
  radix_sort_pairs(keys, order);
  lap("radix_sort");

  // ---- Level 0 dedup (same walk as unidet3d_build_gridpack, but over the
  // value-sorted keys).
  const int64_t cap0 = capacities[0];
  std::vector<int64_t> lvl_keys;
  lvl_keys.reserve(cap0);
  std::memset(counts0, 0, sizeof(float) * cap0);
  int64_t prev = kInvalidKey;
  int64_t vox = -1;
  for (int64_t r = 0; r < n_points; ++r) {
    const int64_t k = keys[r];
    const int32_t i = order[r];
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
      point_inverse[i] = static_cast<int32_t>(cap0);
    }
  }

  lap("dedup_lvl0");

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
    const int64_t block = blocks[lvl];
    const int64_t nb = cap / block;
    const int64_t n_sub = n_subs[lvl];
    const int64_t sub_rows = block / n_sub;
    const int64_t align = aligns[lvl];
    const int64_t* wg = windows + lvl * 3;
    const int64_t* ws27 = wsubs + lvl * 27;
    const int64_t* kptr = lvl_keys.data();
    uint8_t* vl = valids[lvl];
    pfor(cap, n_threads, [&](int64_t i) { vl[i] = i < cur_n; });

    int32_t* bs = bases[lvl];
    int32_t* so = sub_offs_out[lvl];
    int16_t* rl = rel_out[lvl];
    int32_t* rl32 = reinterpret_cast<int32_t*>(rel_out[lvl]);
    const int64_t wpb = (block + 2) / 3;  // packed words per block
    int32_t* ac = active_out[lvl];
    int32_t* nbr_full = want_neighbors ? neighbors[lvl] : nullptr;
    if (nbr_full) {
      pfor((cap - cur_n) * 27, n_threads, [&](int64_t i) {
        nbr_full[cur_n * 27 + i] = static_cast<int32_t>(cap);
      });
    }
    constexpr int kGrp = 9;
    constexpr int kNGrp = 3;
    const int32_t kInt32Max = INT32_MAX;
    std::vector<std::vector<int64_t>> block_miss(nb);

    // Pure-padding blocks (capacities are static worst cases; a typical
    // group fills 40-70%) produce constant outputs — bulk-fill them and
    // run the merge+emit loop only over blocks with real rows. rel = -1
    // is all-ones bytes, so the (27, cap) tails are plain memsets.
    const int64_t nb_real = std::min<int64_t>((cur_n + block - 1) / block,
                                              nb);
    if (nb_real < nb) {
      pfor(nb - nb_real, n_threads, [&](int64_t i) {
        const int64_t kb = nb_real + i;
        ac[kb] = 0;
        for (int g = 0; g < kNGrp; ++g) bs[kb * kNGrp + g] = 0;
        for (int64_t sg = 0; sg < n_sub; ++sg)
          for (int o = 0; o < 27; ++o)
            so[(kb * n_sub + sg) * 27 + o] = -16;
      });
      if (!pack_rel)
        for (int o = 0; o < 27; ++o)
          std::memset(rl + o * cap + nb_real * block, 0xFF,
                      sizeof(int16_t) * (cap - nb_real * block));
      // pack_rel: the caller zero-initialises the packed buffer and the
      // zero word decodes to rel = -1 everywhere — nothing to do.
    }

    pfor(nb_real, n_threads, [&](int64_t kb) {
      // --- Produce this block's 27 neighbor columns into OFFSET-MAJOR
      // scratch (27, block): per offset one tight two-pointer merge loop
      // over the rows (anchor by binary search; queries qk = k + dk are
      // monotone within the block, so the stream equals np.searchsorted
      // on every row). Offset-major makes both the production write and
      // the emission read/write contiguous, and per-(offset, subgroup)
      // mins fall out of the production loop for free — the row-major
      // form re-read the whole scratch twice just for the mins.
      thread_local std::vector<int32_t> scratch;
      thread_local std::vector<int32_t> smins;
      scratch.resize(block * 27);
      smins.assign(27 * n_sub, kInt32Max);
      const int64_t row0 = kb * block;
      const int64_t rows_real = std::clamp<int64_t>(cur_n - row0, 0, block);
      for (int o = 0; o < 27; ++o) {
        int32_t* col = scratch.data() + o * block;
        int32_t* smn = smins.data() + o * n_sub;
        if (o == 13) {  // center = self
          for (int64_t r = 0; r < rows_real; ++r)
            col[r] = static_cast<int32_t>(row0 + r);
          for (int64_t sg = 0; sg < n_sub; ++sg)
            if (sg * sub_rows < rows_real)
              smn[sg] = static_cast<int32_t>(row0 + sg * sub_rows);
        } else {
          const int64_t dk = static_cast<int64_t>(d[o][0]) * (1LL << 24) +
                             static_cast<int64_t>(d[o][1]) * (1LL << 12) +
                             static_cast<int64_t>(d[o][2]);
          int64_t j = 0;
          if (rows_real > 0)
            j = std::lower_bound(kptr, kptr + cur_n, kptr[row0] + dk) - kptr;
          for (int64_t r = 0; r < rows_real; ++r) {
            const int64_t k = kptr[row0 + r];
            const int64_t x = (k >> 24) & 4095, y = (k >> 12) & 4095,
                          z = k & 4095;
            const int64_t qx = x + d[o][0], qy = y + d[o][1],
                          qz = z + d[o][2];
            if (qx < 0 || qx > 4095 || qy < 0 || qy > 4095 || qz < 0 ||
                qz > 4095) {
              col[r] = static_cast<int32_t>(cap);
              continue;
            }
            const int64_t qk = k + dk;
            while (j < cur_n && kptr[j] < qk) ++j;
            if (j < cur_n && kptr[j] == qk) {
              col[r] = static_cast<int32_t>(j);
              int32_t& m = smn[r / sub_rows];
              if (static_cast<int32_t>(j) < m) m = static_cast<int32_t>(j);
            } else {
              col[r] = static_cast<int32_t>(cap);
            }
          }
        }
        for (int64_t r = rows_real; r < block; ++r)
          col[r] = static_cast<int32_t>(cap);
      }
      if (nbr_full && rows_real > 0)  // tests/XLA path only: transpose out
        for (int o = 0; o < 27; ++o) {
          const int32_t* col = scratch.data() + o * block;
          for (int64_t r = 0; r < rows_real; ++r)
            nbr_full[(row0 + r) * 27 + o] = col[r];
        }

      // --- Banded emission (same semantics as unidet3d_build_banded's
      // per-kb lambda): group bases from the per-(offset, subgroup) mins.
      int32_t any_valid = 0;
      int64_t gbase[kNGrp];
      for (int g = 0; g < kNGrp; ++g) {
        int32_t mn = kInt32Max;
        for (int o = g * kGrp; o < (g + 1) * kGrp; ++o)
          for (int64_t sg = 0; sg < n_sub; ++sg)
            mn = std::min(mn, smins[o * n_sub + sg]);
        if (mn != kInt32Max) any_valid = 1;
        int64_t base = (mn == kInt32Max) ? 0 : mn;
        base = std::min<int64_t>(base, std::max<int64_t>(cap - 1, 0));
        base -= base % align;
        gbase[g] = base;
        bs[kb * kNGrp + g] = static_cast<int32_t>(base);
      }
      for (int o = 0; o < 27; ++o) {
        const int32_t* col = scratch.data() + o * block;
        const int64_t base = gbase[o / kGrp];
        const int64_t w = wg[o / kGrp], wsv = ws27[o];
        int64_t lim = std::max<int64_t>(w - wsv, 0);
        lim -= lim % align;
        for (int64_t sg = 0; sg < n_sub; ++sg) {
          const int32_t smn = smins[o * n_sub + sg];
          int64_t soff = ((smn == kInt32Max) ? 0 : smn) - base;
          soff -= ((soff % align) + align) % align;
          soff = std::clamp<int64_t>(soff, 0, lim);
          const int64_t shift = base + soff;
          bool any_in_band = false;
          int16_t* rl_row = rl + o * cap + kb * block;
          int32_t* rlw = rl32 + o * (nb * wpb) + kb * wpb;
          for (int64_t r = sg * sub_rows; r < (sg + 1) * sub_rows; ++r) {
            int32_t idx = col[r];
            bool val = idx < cap;
            int64_t rv = idx - shift;
            bool in_band = val && rv >= 0 && rv < wsv;
            any_in_band |= in_band;
            if (pack_rel) {
              if (in_band)  // e = rv + 1; zero word already means -1
                rlw[r / 3] |= static_cast<int32_t>(rv + 1) << (9 * (r % 3));
            } else {
              rl_row[r] = in_band ? static_cast<int16_t>(rv) : int16_t(-1);
            }
            if (val && !in_band)
              // (o, row, idx) packed in 5+22+22 bits; sorting by the packed
              // value orders by (o, row) since idx is a function of them.
              block_miss[kb].push_back((static_cast<int64_t>(o) << 44) |
                                       ((kb * block + r) << 22) | idx);
          }
          so[(kb * n_sub + sg) * 27 + o] =
              any_in_band ? static_cast<int32_t>(soff) : -16;
        }
      }
      ac[kb] = any_valid;
    }, /*min_serial=*/1);
    lap("blocks(merge+emit)");

    // Misses ordered by (offset, row), matching np.nonzero on the (K, V)
    // miss table; neighbor values ride in the packed entries.
    std::vector<int64_t> all;
    for (auto& bm : block_miss) all.insert(all.end(), bm.begin(), bm.end());
    std::sort(all.begin(), all.end());
    n_miss[lvl] = static_cast<int64_t>(all.size());
    const int64_t mcap = miss_caps[lvl];
    const int64_t kept = std::min<int64_t>(n_miss[lvl], mcap);
    int32_t* mr = miss_rows[lvl];
    int32_t* mn_ = miss_nbrs[lvl];
    int32_t* mo = miss_offs[lvl];
    pfor(mcap, n_threads, [&](int64_t m) {
      if (m >= kept) {
        mr[m] = 1 << 30;
        mn_[m] = 1 << 30;
        mo[m] = 0;
        return;
      }
      mr[m] = static_cast<int32_t>((all[m] >> 22) & ((1 << 22) - 1));
      mn_[m] = static_cast<int32_t>(all[m] & ((1 << 22) - 1));
      mo[m] = static_cast<int32_t>(all[m] >> 44);
    });

    lap("miss_compact");
    if (lvl == n_levels - 1) break;

    // Downsample transition (same as unidet3d_build_gridpack).
    const int64_t ncap = capacities[lvl + 1];
    std::vector<int64_t> pk(cur_n);
    pfor(cur_n, n_threads, [&](int64_t i) {
      int64_t k = kptr[i];
      pk[i] = pack(k >> 36, ((k >> 24) & 4095) >> 1, ((k >> 12) & 4095) >> 1,
                   (k & 4095) >> 1);
    });
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
      const int64_t* it = std::lower_bound(uptr, uptr + uniq.size(), pk[i]);
      int64_t j = it - uptr;
      par[i] = static_cast<int32_t>(j < ncap ? j : ncap);
      int64_t k = kptr[i];
      int64_t x = (k >> 24) & 4095, y = (k >> 12) & 4095, z = k & 4095;
      off[i] = static_cast<int32_t>((x & 1) * 4 + (y & 1) * 2 + (z & 1));
    });
    uniq.resize(nn);
    lvl_keys = std::move(uniq);
    lap("downsample");
  }
}

}  // extern "C"
