"""Debug-image surface: active tracks, track-history trails, normal-colored
Delaunay triangles (reference viz topics; eval/trackviz.py)."""

import numpy as np

from ov_plane_tpu.eval import trackviz
from ov_plane_tpu.frontend.pipeline import FrontendState
from ov_plane_tpu.frontend.plane_track import PlaneTracker
from ov_plane_tpu.utils.config import TrackPlaneOptions


def _two_plane_scene():
    rng = np.random.default_rng(3)
    n_each = 25
    floor = np.stack([rng.uniform(-2, 2, n_each), rng.uniform(1.5, 4, n_each),
                      np.zeros(n_each)], axis=1)
    wall = np.stack([rng.uniform(-2, 2, n_each), np.full(n_each, 4.5),
                     rng.uniform(0.2, 2, n_each)], axis=1)
    pts3 = np.vstack([floor, wall])
    ids = np.arange(len(pts3))
    R_GtoC = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])
    p_CinG = np.array([0.0, 0.0, 1.0])
    pc = (R_GtoC @ (pts3 - p_CinG).T).T
    uv = 300 * pc[:, :2] / pc[:, 2:3] + np.array([320, 240])
    return ids, uv, pts3, R_GtoC, p_CinG


def test_active_and_delaunay_images():
    ids, uv, pts3, R_GtoC, p_CinG = _two_plane_scene()
    tracker = PlaneTracker(TrackPlaneOptions(min_norms=2, max_pairwise_px=500,
                                             max_tri_side_px=500))
    for _ in range(3):
        f2p, _ = tracker.update(ids, uv, pts3, np.ones(len(ids), bool), R_GtoC, p_CinG)
    img = np.full((480, 640), 0.5)

    rgb = trackviz.draw_active(img, ids, uv, np.ones(len(ids), bool), f2p)
    assert rgb.shape == (480, 640, 3) and rgb.dtype == np.uint8
    # Plane members get distinct palette colors (image is no longer grey
    # at their pixels), and two planes -> at least two distinct colors.
    cols = set()
    for k in range(len(ids)):
        if int(ids[k]) in f2p:
            x, y = int(round(uv[k, 0])), int(round(uv[k, 1]))
            cols.add(tuple(rgb[y, x]))
    assert len(cols) >= 2, cols
    assert all(c != (127, 127, 127) for c in cols)

    viz = tracker.last_viz
    assert len(viz["tris"]) > 10 and len(viz["tris"]) == len(viz["norms"])
    rgb2 = trackviz.draw_delaunay_normals(img, viz["uv"], viz["tris"], viz["norms"])
    # Triangle edges drawn in normal-direction colors: many non-grey pixels.
    assert (np.abs(rgb2.astype(int) - 127).max(axis=2) > 40).sum() > 500


def test_history_trails_from_frontend_ring():
    fe = FrontendState(cap=8)
    fe.ids[:3] = [5, 6, 7]
    fe.valid[:3] = True
    for t in range(6):
        fe.uv[:3] = np.array([[100 + 5 * t, 100], [200, 100 + 4 * t], [50, 50]])
        fe.push_history()
    # Recycle slot 2: its trail must be cleared.
    fe.reset_slots(np.array([2]))
    img = np.zeros((240, 320))
    rgb = trackviz.draw_history(img, fe.hist_uv, fe.hist_valid,
                                fe.ids, {5: 0})
    assert rgb.shape == (240, 320, 3)
    # Trail pixels exist along slot 0's path between x=100..125 at y=100.
    row = rgb[98:103, 100:126]
    assert (row.max(axis=2) > 0).sum() > 10
    # Cleared slot leaves no marks near (50, 50).
    assert rgb[45:56, 45:56].max() == 0


def test_plane_stats_recorder_roundtrip(tmp_path):
    """PlaneStatsRecorder writes the reference's plane-tracking CSV schema
    and ov_eval timing_comparison-style parsing recovers it."""
    from ov_plane_tpu.eval import io as eio

    rec = eio.PlaneStatsRecorder()
    rec.add(1.0, {"feat/plane": 5.0, "num plane": 2.0, "state planes": 1.0,
                  "delaunay": 0.001, "matching": 0.002, "total": 0.004})
    rec.add(2.0, {"feat/plane": 6.0, "num plane": 3.0})
    path = str(tmp_path / "plane.csv")
    rec.write(path)
    with open(path) as f:
        header = f.readline().strip().lstrip("# ").split(",")
    assert header == eio.PLANE_TRACK_COLUMNS
    data = np.loadtxt(path, delimiter=",", skiprows=1, ndmin=2)
    assert data.shape == (2, len(eio.PLANE_TRACK_COLUMNS))
    assert data[0, header.index("feat/plane")] == 5.0
    assert data[1, header.index("num plane")] == 3.0
