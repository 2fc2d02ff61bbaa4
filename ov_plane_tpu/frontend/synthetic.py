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
                 wh, model=cams.RADTAN, max_depth: float = 25.0, patch: int = 9,
                 seed: int = 0) -> np.ndarray:
    """[H, W] float32 image: dark background + per-feature fixed random patch."""
    w, h = wh
    img = np.full((h, w), 0.08, np.float32)
    rng_global = np.random.default_rng(seed)
    noise = rng_global.uniform(0, 0.02, size=(h, w)).astype(np.float32)
    img += noise

    p_FinC = (R_ItoC @ (R_GtoI @ (feat_p - p_IinG).T)).T + p_IinC
    z = p_FinC[:, 2]
    ok = (z > 0.2) & (z < max_depth)
    uvn = p_FinC[ok, :2] / z[ok, None]
    uv = _np_distort(uvn, zeta, model)
    idx = np.nonzero(ok)[0]
    half = patch // 2
    for k, (u, v) in enumerate(uv):
        iu, iv = int(round(u)), int(round(v))
        if iu < half or iu >= w - half or iv < half or iv >= h - half:
            continue
        rng = np.random.default_rng(1000 + int(idx[k]))  # per-feature stable texture
        tex = rng.uniform(0.45, 1.0, size=(patch, patch)).astype(np.float32)
        tex[half, half] = 1.0
        img[iv - half : iv + half + 1, iu - half : iu + half + 1] = tex
    return np.clip(img, 0.0, 1.0)
