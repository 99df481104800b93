// occuseg_tpu native host runtime.
//
// TPU-native replacement for the reference's host-side native stack:
//  * segment_supervoxels: Felzenszwalb-Huttenlocher graph segmentation over
//    a voxel-adjacency graph — the equivalent of the external "Segmentator"
//    tool whose .regions.json the reference consumes
//    (reference examples/ScanNet/prepare_data.py:155-157, README "Segmentator").
//  * voxelize_points: hash-map voxel dedup for the host data path — the
//    CPU analog of the reference's CUDPP Multival_Point_Hashtable insert +
//    compact (reference sparseconvnet/SCN/CUDA/CUDPPWrapper.hpp:732-788).
//    The device path uses XLA sort/searchsorted instead; this exists for
//    fast CPU-side data preparation and loaders.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <unordered_map>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  std::vector<int32_t> rank_;
  std::vector<int32_t> size;
  std::vector<float> threshold;

  explicit UnionFind(int32_t n, float k) : parent(n), rank_(n, 0),
                                           size(n, 1), threshold(n, k) {
    std::iota(parent.begin(), parent.end(), 0);
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  int32_t merge(int32_t a, int32_t b) {
    a = find(a); b = find(b);
    if (a == b) return a;
    if (rank_[a] < rank_[b]) std::swap(a, b);
    parent[b] = a;
    size[a] += size[b];
    if (rank_[a] == rank_[b]) rank_[a]++;
    return a;
  }
};

struct Edge {
  int32_t a, b;
  float w;
};

inline int64_t pack_key(int64_t x, int64_t y, int64_t z) {
  // 21 bits per axis, offset to positive range.
  return ((x + (1 << 20)) << 42) | ((y + (1 << 20)) << 21) | (z + (1 << 20));
}

}  // namespace

extern "C" {

// Felzenszwalb segmentation over the voxel-adjacency graph of a point cloud.
// points: [n,3] float32; feat: [n,fdim] float32 (normals or colors) used for
// edge weights (L2 distance); cell: voxel edge length for adjacency;
// k_thresh: FH region-merging constant; min_size: post-merge minimum segment
// size. out_labels: [n] int32 segment id per point (dense 0..S-1).
// Returns the number of segments.
int32_t segment_supervoxels(const float* points, const float* feat,
                            int32_t n, int32_t fdim, float cell,
                            float k_thresh, int32_t min_size,
                            int32_t* out_labels) {
  if (n <= 0) return 0;
  // voxel hash: key -> representative point (first inserted)
  std::unordered_map<int64_t, std::vector<int32_t>> grid;
  grid.reserve(static_cast<size_t>(n) * 2);
  std::vector<int64_t> vx(n), vy(n), vz(n);
  const float inv = 1.0f / cell;
  for (int32_t i = 0; i < n; ++i) {
    vx[i] = static_cast<int64_t>(std::floor(points[i * 3 + 0] * inv));
    vy[i] = static_cast<int64_t>(std::floor(points[i * 3 + 1] * inv));
    vz[i] = static_cast<int64_t>(std::floor(points[i * 3 + 2] * inv));
    grid[pack_key(vx[i], vy[i], vz[i])].push_back(i);
  }

  auto wdist = [&](int32_t a, int32_t b) {
    float s = 0.f;
    for (int32_t d = 0; d < fdim; ++d) {
      const float diff = feat[a * fdim + d] - feat[b * fdim + d];
      s += diff * diff;
    }
    return std::sqrt(s);
  };

  std::vector<Edge> edges;
  edges.reserve(static_cast<size_t>(n) * 8);
  // intra-voxel chain + 13 half-space neighbor offsets (full 26-adjacency
  // counted once)
  static const int off[13][3] = {
      {1, 0, 0}, {0, 1, 0}, {0, 0, 1}, {1, 1, 0}, {1, -1, 0}, {1, 0, 1},
      {1, 0, -1}, {0, 1, 1}, {0, 1, -1}, {1, 1, 1}, {1, 1, -1}, {1, -1, 1},
      {1, -1, -1}};
  for (const auto& kv : grid) {
    const auto& cellpts = kv.second;
    for (size_t j = 1; j < cellpts.size(); ++j)
      edges.push_back({cellpts[j - 1], cellpts[j],
                       wdist(cellpts[j - 1], cellpts[j])});
  }
  for (int32_t i = 0; i < n; ++i) {
    for (const auto& o : off) {
      auto it = grid.find(pack_key(vx[i] + o[0], vy[i] + o[1], vz[i] + o[2]));
      if (it == grid.end()) continue;
      const int32_t j = it->second.front();
      edges.push_back({i, j, wdist(i, j)});
    }
  }

  std::sort(edges.begin(), edges.end(),
            [](const Edge& a, const Edge& b) { return a.w < b.w; });

  UnionFind uf(n, k_thresh);
  for (const auto& e : edges) {
    const int32_t a = uf.find(e.a);
    const int32_t b = uf.find(e.b);
    if (a == b) continue;
    if (e.w <= uf.threshold[a] && e.w <= uf.threshold[b]) {
      const int32_t r = uf.merge(a, b);
      uf.threshold[r] = e.w + k_thresh / uf.size[r];
    }
  }
  // enforce min segment size
  for (const auto& e : edges) {
    const int32_t a = uf.find(e.a);
    const int32_t b = uf.find(e.b);
    if (a != b && (uf.size[a] < min_size || uf.size[b] < min_size))
      uf.merge(a, b);
  }

  std::unordered_map<int32_t, int32_t> remap;
  remap.reserve(n);
  int32_t next = 0;
  for (int32_t i = 0; i < n; ++i) {
    const int32_t r = uf.find(i);
    auto it = remap.find(r);
    if (it == remap.end()) {
      remap.emplace(r, next);
      out_labels[i] = next++;
    } else {
      out_labels[i] = it->second;
    }
  }
  return next;
}

// Hash-map voxelization: coords [n,4] int32 (b,z,y,x) -> per-point voxel row
// ids (dense, first-appearance order) + unique count. The host analog of
// InsertAndCompactPointCloud (CUDPPWrapper.hpp:760-788).
int32_t voxelize_points(const int32_t* coords, int32_t n, int32_t* p2v) {
  std::unordered_map<int64_t, int32_t> table;
  table.reserve(static_cast<size_t>(n) * 2);
  int32_t next = 0;
  for (int32_t i = 0; i < n; ++i) {
    const int32_t b = coords[i * 4 + 0];
    const int64_t z = coords[i * 4 + 1];
    const int64_t y = coords[i * 4 + 2];
    const int64_t x = coords[i * 4 + 3];
    if (b < 0 || z < 0 || y < 0 || x < 0) {
      p2v[i] = -1;
      continue;
    }
    const int64_t key = (static_cast<int64_t>(b) << 36) | (z << 24) |
                        (y << 12) | x;
    auto it = table.find(key);
    if (it == table.end()) {
      table.emplace(key, next);
      p2v[i] = next++;
    } else {
      p2v[i] = it->second;
    }
  }
  return next;
}

}  // extern "C"
