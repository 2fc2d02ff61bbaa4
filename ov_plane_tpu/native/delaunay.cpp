// Incremental 2D Delaunay triangulation (Bowyer-Watson) with a C API.
//
// Native equivalent of the role the vendored CDT library plays in the
// reference (thirdparty/cdt, used at TrackPlane.cpp:715-726 on ~250 feature
// points per frame and for plane re-meshing, ROS1Visualizer.cpp:1264-1275).
// Written from scratch: plain Bowyer-Watson with a super-triangle and
// double-precision predicates with epsilon guards — robust enough for
// image-plane coordinates (pixels, well-scaled), not a general-purpose exact
// predicate implementation.
//
// API (ctypes-friendly):
//   int delaunay_triangulate(const double* xy, int n,
//                            int* tri_out, int max_tris);
// Returns the number of triangles written (3 ints each, CCW), or -1 on error.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Tri {
  int v[3];      // vertex indices (super-triangle uses n, n+1, n+2)
  bool alive;
};

inline double orient2d(const double* a, const double* b, const double* c) {
  return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]);
}

// > 0 if d inside circumcircle of (a, b, c) given CCW orientation.
inline double incircle(const double* a, const double* b, const double* c,
                       const double* d) {
  const double adx = a[0] - d[0], ady = a[1] - d[1];
  const double bdx = b[0] - d[0], bdy = b[1] - d[1];
  const double cdx = c[0] - d[0], cdy = c[1] - d[1];
  const double ad2 = adx * adx + ady * ady;
  const double bd2 = bdx * bdx + bdy * bdy;
  const double cd2 = cdx * cdx + cdy * cdy;
  return adx * (bdy * cd2 - cdy * bd2) - ady * (bdx * cd2 - cdx * bd2) +
         ad2 * (bdx * cdy - cdx * bdy);
}

}  // namespace

extern "C" int delaunay_triangulate(const double* xy, int n, int* tri_out,
                                    int max_tris) {
  if (n < 3 || xy == nullptr || tri_out == nullptr) return -1;

  // Bounding super-triangle.
  double minx = xy[0], maxx = xy[0], miny = xy[1], maxy = xy[1];
  for (int i = 1; i < n; i++) {
    minx = std::fmin(minx, xy[2 * i]);
    maxx = std::fmax(maxx, xy[2 * i]);
    miny = std::fmin(miny, xy[2 * i + 1]);
    maxy = std::fmax(maxy, xy[2 * i + 1]);
  }
  const double dx = maxx - minx, dy = maxy - miny;
  const double dmax = std::fmax(dx, dy) + 1.0;
  const double cx = 0.5 * (minx + maxx), cy = 0.5 * (miny + maxy);

  std::vector<double> pts(2 * (n + 3));
  std::memcpy(pts.data(), xy, sizeof(double) * 2 * n);
  pts[2 * n + 0] = cx - 20.0 * dmax;
  pts[2 * n + 1] = cy - dmax;
  pts[2 * n + 2] = cx + 20.0 * dmax;
  pts[2 * n + 3] = cy - dmax;
  pts[2 * n + 4] = cx;
  pts[2 * n + 5] = cy + 20.0 * dmax;

  std::vector<Tri> tris;
  tris.reserve(4 * n);
  tris.push_back({{n, n + 1, n + 2}, true});

  struct Edge {
    int a, b;
  };
  std::vector<Edge> boundary;

  for (int ip = 0; ip < n; ip++) {
    const double* p = &pts[2 * ip];
    boundary.clear();

    // Find all triangles whose circumcircle contains p; collect boundary of
    // the cavity (edges that appear exactly once).
    std::vector<int> bad;
    for (size_t t = 0; t < tris.size(); t++) {
      if (!tris[t].alive) continue;
      const double* a = &pts[2 * tris[t].v[0]];
      const double* b = &pts[2 * tris[t].v[1]];
      const double* c = &pts[2 * tris[t].v[2]];
      // Triangles are kept CCW; incircle sign then means "inside".
      if (incircle(a, b, c, p) > 0.0) bad.push_back((int)t);
    }
    if (bad.empty()) {
      // Degenerate (duplicate point or numerical issue): skip the point.
      continue;
    }
    // Collect cavity edges.
    std::vector<Edge> edges;
    for (int t : bad) {
      for (int e = 0; e < 3; e++) {
        edges.push_back({tris[t].v[e], tris[t].v[(e + 1) % 3]});
      }
      tris[t].alive = false;
    }
    // Boundary = edges appearing once (compare undirected).
    for (size_t i = 0; i < edges.size(); i++) {
      bool shared = false;
      for (size_t j = 0; j < edges.size(); j++) {
        if (i == j) continue;
        if ((edges[i].a == edges[j].b && edges[i].b == edges[j].a) ||
            (edges[i].a == edges[j].a && edges[i].b == edges[j].b)) {
          shared = true;
          break;
        }
      }
      if (!shared) boundary.push_back(edges[i]);
    }
    // Retriangulate the cavity fan.
    for (const Edge& e : boundary) {
      Tri t{{e.a, e.b, ip}, true};
      // Enforce CCW.
      if (orient2d(&pts[2 * t.v[0]], &pts[2 * t.v[1]], &pts[2 * t.v[2]]) < 0.0) {
        std::swap(t.v[0], t.v[1]);
      }
      tris.push_back(t);
    }
  }

  // Emit triangles not touching the super-triangle.
  int count = 0;
  for (const Tri& t : tris) {
    if (!t.alive) continue;
    if (t.v[0] >= n || t.v[1] >= n || t.v[2] >= n) continue;
    if (count >= max_tris) return -2;
    tri_out[3 * count + 0] = t.v[0];
    tri_out[3 * count + 1] = t.v[1];
    tri_out[3 * count + 2] = t.v[2];
    count++;
  }
  return count;
}
