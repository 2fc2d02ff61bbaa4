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
