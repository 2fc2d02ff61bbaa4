"""Tracking / plane debug images (reference viz-image surface, SURVEY §5.5).

Host-side numpy rasterization of the three debug images the reference
publishes as ROS topics:

* ``draw_active``   — features colored by plane id, non-plane tracks in
  grey-blue (TrackPlane::display_active, TrackPlane.cpp:94-200);
* ``draw_history``  — per-track trails over the recent frames
  (VioManager::get_historical_viz_image, VioManagerHelper.cpp:420-493);
* ``draw_delaunay_normals`` — the current Delaunay triangles colored by
  their 3D normal direction (TrackPlane::display_history_plane,
  TrackPlane.cpp:202-385).

All functions take a grayscale float image in [0, 1] (or uint8) and return
an RGB uint8 array; drawing is pure numpy (Bresenham), no cv2/matplotlib
dependency so the images can be produced inside headless replays.
"""

from __future__ import annotations

import numpy as np

# Stable, bright palette indexed by plane id (matches the reference's intent
# of a per-plane pseudo-random color, TrackPlane.cpp:118-125).
_PALETTE = np.array([
    [230, 60, 60], [60, 200, 60], [70, 110, 245], [235, 200, 50],
    [200, 70, 220], [60, 210, 210], [245, 140, 40], [150, 230, 90],
    [240, 100, 170], [110, 90, 235], [90, 190, 140], [210, 170, 110],
], np.uint8)


def _to_rgb(img: np.ndarray) -> np.ndarray:
    g = np.asarray(img)
    if g.dtype != np.uint8:
        g = np.clip(g * 255.0 if g.max() <= 1.5 else g, 0, 255).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2).copy()


def plane_color(plane_id: int) -> np.ndarray:
    return _PALETTE[int(plane_id) % len(_PALETTE)]


def _draw_disk(rgb, u, v, color, r=2):
    h, w = rgb.shape[:2]
    x, y = int(round(u)), int(round(v))
    if not (0 <= x < w and 0 <= y < h):
        return
    x0, x1 = max(0, x - r), min(w, x + r + 1)
    y0, y1 = max(0, y - r), min(h, y + r + 1)
    rgb[y0:y1, x0:x1] = color


def _draw_line(rgb, p0, p1, color):
    h, w = rgb.shape[:2]
    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    if n > 4 * max(h, w):  # degenerate endpoints: skip
        return
    xs = np.round(np.linspace(x0, x1, n)).astype(int)
    ys = np.round(np.linspace(y0, y1, n)).astype(int)
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    rgb[ys[ok], xs[ok]] = color


def draw_active(img, ids, uv, valid, feat2plane) -> np.ndarray:
    """Active tracks: plane members colored by plane id, rest grey-blue."""
    rgb = _to_rgb(img)
    ids = np.asarray(ids)
    uv = np.asarray(uv)
    valid = np.asarray(valid, bool)
    for k in np.nonzero(valid)[0]:
        pid = feat2plane.get(int(ids[k]), -1)
        color = plane_color(pid) if pid >= 0 else np.array([140, 140, 200], np.uint8)
        _draw_disk(rgb, uv[k, 0], uv[k, 1], color, r=3 if pid >= 0 else 2)
    return rgb


def draw_history(img, hist_uv, hist_valid, ids=None, feat2plane=None) -> np.ndarray:
    """Track trails: ``hist_uv`` [H, N, 2] with [H, N] validity, oldest
    first. Trail segments connect consecutive valid positions of a slot;
    the newest point gets a disk (plane-colored when known)."""
    rgb = _to_rgb(img)
    hist_uv = np.asarray(hist_uv)
    hist_valid = np.asarray(hist_valid, bool)
    H, N = hist_valid.shape
    for k in range(N):
        frames = np.nonzero(hist_valid[:, k])[0]
        if len(frames) == 0:
            continue
        pid = -1
        if ids is not None and feat2plane is not None:
            pid = feat2plane.get(int(np.asarray(ids)[k]), -1)
        col = plane_color(pid) if pid >= 0 else np.array([90, 200, 90], np.uint8)
        for a, b in zip(frames[:-1], frames[1:]):
            if b - a == 1:  # only consecutive-frame segments
                _draw_line(rgb, hist_uv[a, k], hist_uv[b, k], (col * 0.6).astype(np.uint8))
        _draw_disk(rgb, hist_uv[frames[-1], k, 0], hist_uv[frames[-1], k, 1], col, r=2)
    return rgb


def draw_delaunay_normals(img, uv_by_id, tris, tri_norms) -> np.ndarray:
    """Delaunay triangles colored by normal direction: |n| maps to RGB
    (the reference's normal-colored triangle image). ``tris`` is a list of
    id-triples, ``uv_by_id`` maps id -> pixel, ``tri_norms`` one unit
    normal per triangle."""
    rgb = _to_rgb(img)
    for t, n in zip(tris, tri_norms):
        if any(i not in uv_by_id for i in t):
            continue
        color = np.clip(np.abs(np.asarray(n)) * 255.0, 0, 255).astype(np.uint8)
        pts = [uv_by_id[i] for i in t]
        for a, b in ((0, 1), (1, 2), (2, 0)):
            _draw_line(rgb, pts[a], pts[b], color)
    return rgb
