"""Native component tests: Delaunay vs scipy/Qhull oracle, voxel map KNN vs
brute force."""

import numpy as np
import pytest

from ov_plane_tpu import native

RNG = np.random.default_rng(9)


def _edges_of(tris):
    e = set()
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            e.add((min(a, b), max(a, b)))
    return e


def test_delaunay_matches_scipy_oracle():
    from scipy.spatial import Delaunay as SciDelaunay

    pts = RNG.uniform(0, 640, size=(120, 2))
    tris = native.delaunay(pts)
    sci = SciDelaunay(pts).simplices
    assert len(tris) == len(sci), (len(tris), len(sci))
    # Same triangulation up to triangle ordering (generic position → unique).
    def canon(ts):
        return set(tuple(sorted(t)) for t in ts)

    assert canon(tris) == canon(sci)


def test_delaunay_empty_circumcircle_property():
    pts = RNG.uniform(-5, 5, size=(40, 2))
    tris = native.delaunay(pts)
    assert len(tris) > 0
    for t in tris[:20]:
        a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
        # Circumcenter.
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1]) + (c @ c) * (a[1] - b[1])) / d
        uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0]) + (c @ c) * (b[0] - a[0])) / d
        center = np.array([ux, uy])
        r = np.linalg.norm(a - center)
        dists = np.linalg.norm(pts - center, axis=1)
        inside = np.sum(dists < r - 1e-9)
        assert inside <= 3  # only the triangle's own vertices


def test_delaunay_small_and_degenerate():
    assert len(native.delaunay(np.zeros((2, 2)))) == 0
    tri = native.delaunay(np.array([[0, 0], [1, 0], [0, 1.0]]))
    assert len(tri) == 1
    # Duplicate points shouldn't crash.
    pts = np.array([[0, 0], [1, 0], [0, 1.0], [0, 0], [1, 1]])
    tris = native.delaunay(pts)
    assert len(tris) >= 2


def _exact_incircle(a, b, c, d):
    """Exact-sign incircle via the native adaptive predicate."""
    import ctypes

    lib = native._build_and_load("delaunay")
    lib.delaunay_incircle.restype = ctypes.c_double
    P = ctypes.POINTER(ctypes.c_double)
    arrs = [np.ascontiguousarray(p, np.float64) for p in (a, b, c, d)]
    return lib.delaunay_incircle(*[x.ctypes.data_as(P) for x in arrs])


def _check_delaunay_certificate(pts, tris):
    """The Delaunay certificate: no input point strictly inside any triangle's
    circumcircle, every triangle CCW and non-degenerate (exact arithmetic —
    this is the definition, not an approximation)."""
    from fractions import Fraction

    def o2d(a, b, c):
        ax, ay = Fraction(a[0]), Fraction(a[1])
        bx, by = Fraction(b[0]), Fraction(b[1])
        cx, cy = Fraction(c[0]), Fraction(c[1])
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    for t in tris:
        a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
        assert o2d(a, b, c) > 0, f"triangle {t} not strictly CCW"
        for j, p in enumerate(pts):
            if j in set(int(v) for v in t):
                continue
            assert _exact_incircle(a, b, c, p) <= 0.0, (
                f"point {j} strictly inside circumcircle of {t}")


def test_delaunay_integer_pixel_grid():
    """The REAL input class: FAST detections on an occupancy grid produce
    integer pixels with massively collinear/cocircular structure (every unit
    square is a cocircular quad). Reference vendors Shewchuk's exact
    predicates for exactly this (thirdparty/cdt/predicates.h)."""
    R, C = 6, 8
    yy, xx = np.mgrid[0:R, 0:C]
    pts = np.stack([xx.ravel() * 40.0, yy.ravel() * 40.0], axis=1)  # 40 px pitch
    tris = native.delaunay(pts)
    # Euler count for a full grid triangulation: 2(R-1)(C-1) triangles.
    assert len(tris) == 2 * (R - 1) * (C - 1), len(tris)
    _check_delaunay_certificate(pts, tris)
    # Total area must tile the rectangle exactly.
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    area = 0.5 * np.abs(np.cross(b - a, c - a)).sum()
    assert area == (C - 1) * 40.0 * (R - 1) * 40.0


def test_delaunay_collinear_rows():
    # Fully collinear input: no valid triangle exists.
    row = np.stack([np.arange(10.0) * 7.0, np.full(10, 3.0)], axis=1)
    assert len(native.delaunay(row)) == 0
    # Collinear row + one apex: a fan of n-1 triangles.
    pts = np.concatenate([row, [[35.0, 50.0]]])
    tris = native.delaunay(pts)
    assert len(tris) == 9, len(tris)
    _check_delaunay_certificate(pts, tris)


def test_delaunay_cocircular_ring():
    # 12 points EXACTLY on the circle x^2 + y^2 = 25 (integer coordinates):
    # every incircle test among them is an exact tie.
    ring = [(5, 0), (4, 3), (3, 4), (0, 5), (-3, 4), (-4, 3), (-5, 0),
            (-4, -3), (-3, -4), (0, -5), (3, -4), (4, -3)]
    pts = np.asarray(ring, np.float64)
    tris = native.delaunay(pts)
    assert len(tris) == len(pts) - 2, len(tris)  # any fan of the convex polygon
    _check_delaunay_certificate(pts, tris)


def test_delaunay_duplicates_match_dedup():
    rng = np.random.default_rng(3)
    base = np.round(rng.uniform(0, 640, size=(40, 2)))  # integer pixels
    dup = np.concatenate([base, base[::3]])             # exact duplicates
    tris_dup = native.delaunay(dup)
    tris_base = native.delaunay(base)

    def canon(ts):
        return set(tuple(sorted(int(v) for v in t)) for t in ts)

    # Duplicate rows beyond the first occurrence must be ignored; indices of
    # the originals are < len(base) so the triangle sets are comparable.
    assert canon(tris_dup) == canon(tris_base)
    _check_delaunay_certificate(base, tris_base)


def test_voxel_map_knn_matches_bruteforce():
    pts = RNG.normal(size=(500, 3)) * 3
    ids = np.arange(500, dtype=np.int32)
    m = native.VoxelPointMap(voxel=0.5)
    m.add(pts, ids)
    assert len(m) == 500
    for _ in range(10):
        q = RNG.normal(size=3) * 3
        d, xyz, got_ids = m.knn(q, 5)
        brute = np.sort(np.linalg.norm(pts - q, axis=1))[:5]
        np.testing.assert_allclose(d, brute, atol=1e-12)


def test_voxel_map_downsample():
    pts = RNG.uniform(0, 1, size=(1000, 3)) * 0.5  # all within ~5^3 cells of 0.1
    m = native.VoxelPointMap(voxel=0.5, downsample=0.1)
    added = m.add(pts, downsample=True)
    assert added < 1000
    assert added <= 6 ** 3
    xyz, _ = m.flatten()
    assert len(xyz) == added


def test_voxel_map_dedup_matches_device_store():
    """The production --map-out path (run_euroc.py) consolidates the device
    MapBlocks cloud through the native host grid; both must implement the
    SAME downsample semantics — floor(p/voxel) lattice, first point per voxel
    in insertion order (the ikd-tree's Add_Points(downsample_on=true),
    ikd_tree.h:240-261) — so the host pass is a dedup, never a re-sampling.
    """
    import jax.numpy as jnp

    from ov_plane_tpu.frontend import map_blocks as mb

    voxel = 0.25
    n_batches, B = 4, 64
    dev = mb.MapBlocks.create(1024, voxel=voxel, dtype=jnp.float64)
    host = native.VoxelPointMap(voxel=1.0, downsample=voxel)
    all_pts = []
    for b in range(n_batches):
        pts = RNG.uniform(-2, 2, size=(B, 3))
        pts[b::3] = pts[(b + 1) % B]  # force duplicates within/between batches
        pid = RNG.integers(0, 5, size=B).astype(np.int32)
        mask = np.ones(B, bool)
        mask[-3:] = False
        dev, _ = mb.insert(dev, jnp.asarray(pts), jnp.asarray(pid), jnp.asarray(mask))
        host.add(pts[mask], pid[mask].astype(np.int32), downsample=True)
        all_pts.append(pts[mask])

    dev_act = np.asarray(dev.plane_id) >= 0
    dev_pts = np.asarray(dev.points)[dev_act]
    host_pts, _ = host.flatten()
    assert len(dev_pts) == len(host_pts)
    canon = lambda a: set(map(tuple, np.round(a, 9)))
    assert canon(dev_pts) == canon(host_pts)

    # The map-out consolidation invariant: re-deduplicating an already
    # device-deduped cloud at the same resolution is the identity.
    grid2 = native.VoxelPointMap(voxel=1.0, downsample=voxel)
    kept = grid2.add(dev_pts, downsample=True)
    assert kept == len(dev_pts)
