"""Loop-closure information pack (reference pub_loop_* topic set,
ROS1Visualizer.cpp:106-111 fed by VioManager::get_active_tracks /
active_tracks_posinG, VioManagerHelper.cpp): everything an external
loop-closure / relocalization module needs from one frame —

  pose (q_GtoI, p_IinG), camera extrinsics/intrinsics, the active tracks'
  global 3D positions with their current (u, v, depth), and a sparse depth
  image rasterized from those tracks (the reference's loop_depth topic).

File-based analogue of the topic surface: `save_pack` writes one npz per
frame; a consumer replays them in timestamp order.
"""

from __future__ import annotations

import os

import numpy as np


def loop_pack(t, q_GtoI, p_IinG, R_GtoC, p_CinG, calib_cam, zeta,
              ids, uv, p3, ok, wh, depth_scale=1000.0):
    """Assemble the per-frame pack. ids/uv/p3/ok are the frontend's
    whole-track triangulation slots (VisionPipeline.last_tri); only valid
    slots with positive depth are emitted."""
    ids = np.asarray(ids)
    uv = np.asarray(uv, np.float64)
    p3 = np.asarray(p3, np.float64)
    ok = np.asarray(ok, bool) & (ids >= 0)
    p_C = (np.asarray(R_GtoC) @ (p3 - np.asarray(p_CinG)).T).T
    depth = p_C[:, 2]
    keep = ok & (depth > 0.05) & np.isfinite(depth)

    w, h = wh
    depth_img = np.zeros((h, w), np.uint16)
    uvi = np.round(uv[keep]).astype(int)
    inb = (uvi[:, 0] >= 0) & (uvi[:, 0] < w) & (uvi[:, 1] >= 0) & (uvi[:, 1] < h)
    d_mm = np.clip(depth[keep][inb] * depth_scale, 0, 65535).astype(np.uint16)
    depth_img[uvi[inb, 1], uvi[inb, 0]] = d_mm

    return {
        "t": np.float64(t),
        "q_GtoI": np.asarray(q_GtoI, np.float64),
        "p_IinG": np.asarray(p_IinG, np.float64),
        "calib_cam": np.asarray(calib_cam, np.float64),  # q_ItoC (xyzw) + p_IinC
        "intrinsics": np.asarray(zeta, np.float64),
        "feat_id": ids[keep].astype(np.int64),
        "feat_p_G": p3[keep],
        "feat_uvd": np.concatenate([uv[keep], depth[keep, None]], axis=1),
        "depth_img": depth_img,
        "depth_scale": np.float64(depth_scale),
    }


def save_pack(directory, frame_no, pack) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"loop_{frame_no:06d}.npz")
    np.savez_compressed(path, **pack)
    return path
