"""Synthetic image rendering from the simulator world.

Renders the sim feature map as stable textured blobs so the full image
pipeline (KLT + FAST + plane detection + filter) can be exercised end-to-end
without real datasets — the image-level analogue of the reference's TrackSIM
shortcut, but actually driving the vision code.
"""

from __future__ import annotations

import numpy as np

from ov_plane_tpu.ops import cams


def _np_distort(uvn, zeta, model):
    from ov_plane_tpu.sim.simulator import _np_distort as f

    return f(uvn, zeta, model)


def render_frame(feat_p: np.ndarray, R_GtoI: np.ndarray, p_IinG: np.ndarray,
                 R_ItoC: np.ndarray, p_IinC: np.ndarray, zeta: np.ndarray,
                 wh, model=cams.RADTAN, max_depth: float = 25.0,
                 patch_world: float = 0.10, seed: int = 0) -> np.ndarray:
    """[H, W] float32 image: dark background + per-feature textured patch.

    Each feature is a fixed-size WORLD patch (`patch_world` meters across)
    whose texture is resampled from a per-feature master texture anchored at
    the feature's true projection — so the patch scales with depth like a
    real surface marking and the trackable center stays exactly on the
    projected 3D point (measurement-model consistent).
    """
    w, h = wh
    img = np.full((h, w), 0.08, np.float32)
    rng_global = np.random.default_rng(seed)
    img += rng_global.uniform(0, 0.02, size=(h, w)).astype(np.float32)
    f = 0.5 * (zeta[0] + zeta[1])

    p_FinC = (R_ItoC @ (R_GtoI @ (feat_p - p_IinG).T)).T + p_IinC
    z = p_FinC[:, 2]
    ok = (z > 0.2) & (z < max_depth)
    uvn = p_FinC[ok, :2] / z[ok, None]
    uv = _np_distort(uvn, zeta, model)
    idx = np.nonzero(ok)[0]

    T = 17  # master texture resolution
    for k, (u, v) in enumerate(uv):
        # Apparent half-size in pixels (depth-scaled).
        half = int(np.clip(round(0.5 * patch_world * f / z[idx[k]]), 3, 12))
        iu, iv = int(round(u)), int(round(v))
        if iu < half or iu >= w - half or iv < half or iv >= h - half:
            continue
        rng = np.random.default_rng(1000 + int(idx[k]))  # stable per-feature texture
        master = rng.uniform(0.45, 1.0, size=(T, T)).astype(np.float32)
        master[T // 2, T // 2] = 1.0
        # Bilinear resample of the master onto the (2*half+1)² footprint,
        # anchored at the (subpixel) projection.
        du = np.arange(-half, half + 1)[None, :] + (iu - u)
        dv = np.arange(-half, half + 1)[:, None] + (iv - v)
        tx = (du / half * (T // 2 - 1)) + T // 2
        ty = (dv / half * (T // 2 - 1)) + T // 2
        tx0 = np.clip(np.floor(tx).astype(int), 0, T - 2)
        ty0 = np.clip(np.floor(ty).astype(int), 0, T - 2)
        fx = np.clip(tx - tx0, 0, 1)
        fy = np.clip(ty - ty0, 0, 1)
        patch = (
            master[ty0, tx0] * (1 - fx) * (1 - fy) + master[ty0, tx0 + 1] * fx * (1 - fy)
            + master[ty0 + 1, tx0] * (1 - fx) * fy + master[ty0 + 1, tx0 + 1] * fx * fy
        )
        img[iv - half : iv + half + 1, iu - half : iu + half + 1] = patch
    return np.clip(img, 0.0, 1.0)
