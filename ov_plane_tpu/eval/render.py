"""Minimal OBJ model loading + wireframe projection (AR overlay).

Equivalent of the reference's vendored tinyrenderer ``Model``
(thirdparty/render/render_model.{h,cpp}) used to draw a teapot onto detected
planes (ROS1Visualizer.cpp:1336-1410). Here: parse OBJ vertices/faces, pose
the model on a CP plane (Gram-Schmidt frame), project edges through the
camera, and return 2D line segments (for any plotting backend) or rasterize
into an image array.
"""

from __future__ import annotations

import numpy as np

from ov_plane_tpu.sim.simulator import _np_distort
from ov_plane_tpu.ops import cams


def load_obj(path: str):
    """Returns (verts [V, 3], faces [F, 3] int)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:4]]
                faces.append(idx)
    return np.asarray(verts, float), np.asarray(faces, int)


def plane_frame(cp: np.ndarray):
    """Gram-Schmidt frame on a CP plane: R_GtoP rows (x, y, n), origin = cp
    (InitializerHelper::gram_schmidt usage, ROS1Visualizer.cpp:1233)."""
    d = np.linalg.norm(cp)
    n = cp / max(d, 1e-12)
    a = np.array([1.0, 0.0, 0.0]) if abs(n[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    x = a - n * (n @ a)
    x /= np.linalg.norm(x)
    y = np.cross(n, x)
    return np.stack([x, y, n]), cp


def wireframe_segments(verts, faces, cp, scale, R_GtoC, p_CinG, zeta, wh, model=cams.RADTAN,
                       anchor=None):
    """Project the model (posed on the plane) into the camera; returns
    [E, 2, 2] pixel segments of visible edges.

    anchor: where on the plane to place the model (a 3D point, projected onto
    the plane). Default is the plane's closest point to the global origin —
    pass the camera's optical-axis/plane intersection (ar_anchor_in_view) to
    keep the model in frame like the reference's AR-Table overlay."""
    R_GtoP, origin = plane_frame(cp)
    if anchor is not None:
        d = np.linalg.norm(cp)
        n = cp / max(d, 1e-9)
        origin = np.asarray(anchor) - (np.asarray(anchor) @ n - d) * n
    # Model frame: x/y in plane, z along normal; center + scale.
    v = verts - verts.mean(axis=0)
    v = v / max(np.abs(v).max(), 1e-9) * scale
    p_G = origin[None, :] + v @ R_GtoP  # rows of R_GtoP are the plane axes
    p_C = (R_GtoC @ (p_G - p_CinG).T).T
    z = p_C[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        uvn = p_C[:, :2] / z[:, None]
    uv = _np_distort(np.nan_to_num(uvn), np.asarray(zeta), model)
    w, h = wh
    ok = (z > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)

    segs = []
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            if ok[a] and ok[b]:
                segs.append([uv[a], uv[b]])
    return np.asarray(segs) if segs else np.zeros((0, 2, 2))


def rasterize_segments(segs, wh, img=None, value=1.0):
    """Draw segments into an [H, W] array (simple DDA)."""
    w, h = wh
    if img is None:
        img = np.zeros((h, w), np.float32)
    for (u0, v0), (u1, v1) in segs:
        n = int(max(abs(u1 - u0), abs(v1 - v0), 1))
        for t in np.linspace(0.0, 1.0, n + 1):
            u = int(round(u0 + t * (u1 - u0)))
            v = int(round(v0 + t * (v1 - v0)))
            if 0 <= u < w and 0 <= v < h:
                img[v, u] = value
    return img


def ar_anchor_in_view(cp, R_GtoC, p_CinG, max_range=25.0):
    """Intersection of the camera's optical axis with the plane — the natural
    AR placement point. Returns None when the plane is not ahead."""
    d = np.linalg.norm(cp)
    n = cp / max(d, 1e-9)
    ray = np.asarray(R_GtoC)[2]          # +z camera axis in global frame
    denom = ray @ n
    if abs(denom) < 1e-9:
        return None
    t = (d - np.asarray(p_CinG) @ n) / denom
    if not (0.1 < t < max_range):
        return None
    return np.asarray(p_CinG) + t * ray
