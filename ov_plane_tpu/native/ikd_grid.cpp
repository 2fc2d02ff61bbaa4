// Incremental voxel-hash point map with KNN and voxel downsampling.
//
// Native equivalent of the role the vendored HKU-MARS ikd-tree plays in the
// reference (thirdparty/ikd, used for (a) per-plane KNN spatial outlier
// filtering, TrackPlane.cpp:1011-1040, and (b) voxel downsampling of plane
// clouds, ROS1Visualizer.cpp:1210-1227). Designed from scratch around a
// spatial hash instead of a rebalancing k-d tree: insertion is O(1),
// downsample-on-insert keeps one point per voxel, and KNN queries scan the
// 3x3x3 voxel neighborhood ring-expanding until k hits are guaranteed.
// At the reference's scales (<= a few hundred thousand points) this is
// simpler and faster than an incremental k-d tree.
//
// C API (ctypes):
//   void* ikd_create(double voxel, double downsample);
//   void  ikd_destroy(void* h);
//   int   ikd_add(void* h, const double* xyz, const int* id, int n, int downsample_on);
//   int   ikd_size(void* h);
//   int   ikd_flatten(void* h, double* xyz_out, int* id_out, int max_n);
//   int   ikd_knn(void* h, const double* query, int k, double* dist_out,
//                 double* xyz_out, int* id_out);   // returns #found
//   void  ikd_clear(void* h);

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct Point {
  double x, y, z;
  int id;
};

struct VoxelKey {
  int64_t x, y, z;
  bool operator==(const VoxelKey& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};

struct VoxelHash {
  size_t operator()(const VoxelKey& k) const {
    // Large-prime mixing (same spirit as common spatial hashes).
    return (size_t)(k.x * 73856093LL ^ k.y * 19349669LL ^ k.z * 83492791LL);
  }
};

struct Map {
  double voxel;        // hash-cell size for queries
  double downsample;   // downsample voxel size (one point kept per cell)
  std::unordered_map<VoxelKey, std::vector<Point>, VoxelHash> cells;
  std::unordered_map<VoxelKey, int, VoxelHash> ds_filled;  // downsample cells
  int count = 0;

  VoxelKey key_of(double x, double y, double z, double s) const {
    return {(int64_t)std::floor(x / s), (int64_t)std::floor(y / s),
            (int64_t)std::floor(z / s)};
  }
};

}  // namespace

extern "C" {

void* ikd_create(double voxel, double downsample) {
  Map* m = new Map();
  m->voxel = voxel > 0 ? voxel : 0.5;
  m->downsample = downsample > 0 ? downsample : 0.1;
  return m;
}

void ikd_destroy(void* h) { delete (Map*)h; }

void ikd_clear(void* h) {
  Map* m = (Map*)h;
  m->cells.clear();
  m->ds_filled.clear();
  m->count = 0;
}

int ikd_add(void* h, const double* xyz, const int* id, int n, int downsample_on) {
  Map* m = (Map*)h;
  int added = 0;
  for (int i = 0; i < n; i++) {
    const double x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    if (downsample_on) {
      VoxelKey dk = m->key_of(x, y, z, m->downsample);
      auto it = m->ds_filled.find(dk);
      if (it != m->ds_filled.end()) continue;  // cell occupied -> drop
      m->ds_filled.emplace(dk, 1);
    }
    VoxelKey k = m->key_of(x, y, z, m->voxel);
    m->cells[k].push_back({x, y, z, id ? id[i] : -1});
    m->count++;
    added++;
  }
  return added;
}

int ikd_size(void* h) { return ((Map*)h)->count; }

int ikd_flatten(void* h, double* xyz_out, int* id_out, int max_n) {
  Map* m = (Map*)h;
  int c = 0;
  for (const auto& kv : m->cells) {
    for (const Point& p : kv.second) {
      if (c >= max_n) return c;
      xyz_out[3 * c] = p.x;
      xyz_out[3 * c + 1] = p.y;
      xyz_out[3 * c + 2] = p.z;
      if (id_out) id_out[c] = p.id;
      c++;
    }
  }
  return c;
}

int ikd_knn(void* h, const double* q, int k, double* dist_out, double* xyz_out,
            int* id_out) {
  Map* m = (Map*)h;
  if (m->count == 0 || k <= 0) return 0;
  const double s = m->voxel;
  VoxelKey qk = m->key_of(q[0], q[1], q[2], s);

  struct Hit {
    double d2;
    Point p;
  };
  std::vector<Hit> hits;

  // Ring-expand: radius r covers all points within distance (r)*s of the
  // query voxel; stop once we have k hits whose distance is guaranteed
  // covered by the scanned rings.
  const int max_ring = 64;
  for (int r = 0; r <= max_ring; r++) {
    // Scan the shell at Chebyshev radius r.
    for (int dx = -r; dx <= r; dx++) {
      for (int dy = -r; dy <= r; dy++) {
        for (int dz = -r; dz <= r; dz++) {
          if (std::max({std::abs(dx), std::abs(dy), std::abs(dz)}) != r) continue;
          VoxelKey nk{qk.x + dx, qk.y + dy, qk.z + dz};
          auto it = m->cells.find(nk);
          if (it == m->cells.end()) continue;
          for (const Point& p : it->second) {
            const double ddx = p.x - q[0], ddy = p.y - q[1], ddz = p.z - q[2];
            hits.push_back({ddx * ddx + ddy * ddy + ddz * ddz, p});
          }
        }
      }
    }
    if ((int)hits.size() >= k) {
      // Points in unscanned voxels are at least (r)*s away (ring r scanned
      // fully; closest unscanned cell is at Chebyshev radius r+1, i.e.,
      // Euclidean >= r*s from anywhere in the query voxel).
      std::nth_element(hits.begin(), hits.begin() + (k - 1), hits.end(),
                       [](const Hit& a, const Hit& b) { return a.d2 < b.d2; });
      const double kth = hits[k - 1].d2;
      if (kth <= (double)r * s * (double)r * s || r == max_ring) break;
    }
  }
  if (hits.empty()) return 0;
  const int kk = std::min<int>(k, (int)hits.size());
  std::partial_sort(hits.begin(), hits.begin() + kk, hits.end(),
                    [](const Hit& a, const Hit& b) { return a.d2 < b.d2; });
  for (int i = 0; i < kk; i++) {
    dist_out[i] = std::sqrt(hits[i].d2);
    if (xyz_out) {
      xyz_out[3 * i] = hits[i].p.x;
      xyz_out[3 * i + 1] = hits[i].p.y;
      xyz_out[3 * i + 2] = hits[i].p.z;
    }
    if (id_out) id_out[i] = hits[i].p.id;
  }
  return kk;
}

}  // extern "C"
