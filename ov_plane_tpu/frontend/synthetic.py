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
        # Band-limit the texture (camera-PSF analogue): iid per-pixel noise
        # has no valid gradient linearization, which costs LK ~1 px of
        # subpixel accuracy — enough to destroy downstream triangle normals.
        k5 = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0], np.float32)
        k5 /= k5.sum()
        master = np.apply_along_axis(lambda r: np.convolve(r, k5, "same"), 0, master)
        master = np.apply_along_axis(lambda r: np.convolve(r, k5, "same"), 1, master)
        lo, hi = master.min(), master.max()
        master = 0.45 + 0.55 * (master - lo) / max(hi - lo, 1e-6)
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


_BEARING_CACHE: dict = {}


def _pixel_bearings(zeta: np.ndarray, wh, model) -> np.ndarray:
    """[H, W, 3] unit-less camera-frame bearings (x, y, 1) for every pixel,
    through the full distortion model (Newton undistort, cached per calib).

    Convention: pixel [v, u]'s center is AT distorted image coordinate
    (u, v) — the OpenCV convention shared by the KLT tracker, the blob
    renderer, and the filter's measurement model. (A +0.5 offset here is a
    systematic half-pixel bias on every synthetic measurement.)"""
    key = (bytes(np.asarray(zeta, np.float64)), tuple(wh), int(model))
    if key in _BEARING_CACHE:
        return _BEARING_CACHE[key]
    import jax
    import jax.numpy as jnp

    w, h = wh
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    uv = np.stack([uu.ravel(), vv.ravel()], axis=1)
    und = jax.jit(jax.vmap(lambda p: cams.undistort(p, jnp.asarray(zeta), model)))
    uvn = np.asarray(und(jnp.asarray(uv)))
    bear = np.concatenate([uvn, np.ones((uvn.shape[0], 1))], axis=1).reshape(h, w, 3)
    _BEARING_CACHE[key] = bear
    return bear


def _value_noise(s: np.ndarray, t: np.ndarray, cell: float, seed: int) -> np.ndarray:
    """Smooth 2D value noise at world coords (s, t), one octave."""
    def hash01(ix, iy):
        n = (ix.astype(np.int64) * 374761393 + iy.astype(np.int64) * 668265263 + seed * 1442695041) & 0x7FFFFFFF
        n = (n ^ (n >> 13)) * 1274126177 & 0x7FFFFFFF
        return (n & 0xFFFF) / 65535.0

    x = s / cell
    y = t / cell
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = x - x0
    fy = y - y0
    fx = fx * fx * (3 - 2 * fx)   # smoothstep
    fy = fy * fy * (3 - 2 * fy)
    v00 = hash01(x0, y0)
    v10 = hash01(x0 + 1, y0)
    v01 = hash01(x0, y0 + 1)
    v11 = hash01(x0 + 1, y0 + 1)
    return (v00 * (1 - fx) * (1 - fy) + v10 * fx * (1 - fy)
            + v01 * (1 - fx) * fy + v11 * fx * fy)


def _speckle(s: np.ndarray, t: np.ndarray, cell: float, seed: int,
             px_per_m: np.ndarray = None, r_lo: float = 0.05,
             r_hi: float = 0.15) -> np.ndarray:
    """World-anchored sparse speckle: at most one dot per (cell × cell) tile,
    present with p≈0.6, at a hash-jittered position with a hash-drawn radius
    and signed contrast. Returns a [H, W] additive intensity term.

    This is the DISTINCTIVE texture component: pure value noise is
    quasi-periodic and self-similar at LK-window scale, so a tracker locks
    onto lookalike bumps a cell away and passes the forward-backward check —
    measured: only 16% of gate-passing fresh tracks were within 3 px of the
    true correspondence before this layer; real surfaces (wood grain pits,
    wall marks, carpet flecks) carry exactly this kind of aperiodic detail.
    Dots fade out when their on-screen radius nears the pixel pitch (same
    mip-style band-limiting as the noise octaves)."""
    def hashk(ix, iy, k):
        n = (ix.astype(np.int64) * 374761393 + iy.astype(np.int64) * 668265263
             + (seed * 31 + k) * 1442695041) & 0x7FFFFFFF
        n = (n ^ (n >> 13)) * 1274126177 & 0x7FFFFFFF
        return (n & 0xFFFF) / 65535.0

    x = s / cell
    y = t / cell
    out = np.zeros_like(s)
    x0f = np.floor(x)
    y0f = np.floor(y)
    # A dot can spill into neighbour tiles: check the 3×3 tile neighbourhood.
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ix = x0f + dx
            iy = y0f + dy
            present = hashk(ix, iy, 0) < 0.6
            cx = ix + 0.15 + 0.7 * hashk(ix, iy, 1)
            cy = iy + 0.15 + 0.7 * hashk(ix, iy, 2)
            r = (r_lo + (r_hi - r_lo) * hashk(ix, iy, 3))    # radius in cells
            amp = np.where(hashk(ix, iy, 4) < 0.5, -0.35, 0.35)
            d2 = (x - cx) ** 2 + (y - cy) ** 2
            # Soft-edged disk (smoothstep over ~30% of the radius).
            e = np.clip((r - np.sqrt(d2)) / (0.3 * r + 1e-9), 0.0, 1.0)
            # Band-limit: fade dots whose screen radius < ~1.5 px.
            r_px = r * cell * px_per_m
            w_o = np.clip((r_px - 1.0) / 1.5, 0.0, 1.0)
            out += np.where(present, amp * e * e * (3 - 2 * e) * w_o, 0.0)
    return out


def render_frame_textured(plane_corners: np.ndarray, plane_normal: np.ndarray,
                          plane_d: np.ndarray, feat_p: np.ndarray,
                          R_GtoI: np.ndarray, p_IinG: np.ndarray,
                          R_ItoC: np.ndarray, p_IinC: np.ndarray,
                          zeta: np.ndarray, wh, model=cams.RADTAN,
                          texture_cell: float = 0.22, seed: int = 0,
                          feat_patch_world: float = 0.12,
                          blobs: bool = True,
                          speckle_cells: tuple = (0.15,)) -> np.ndarray:
    """Raycast render of the simulator's cuboid room with procedurally
    textured planes, plus the measurement-consistent feature blobs on top.

    Unlike `render_frame` (isolated blobs on black — pathologically hard for
    pyramidal LK because coarse levels see nothing), every pixel that hits a
    room plane gets geometrically consistent surface texture: the world-space
    (s, t) coordinates of the ray/plane hit index two octaves of smooth value
    noise. Pyramid tracking, FAST detection away from feature anchors, and
    Delaunay-normal plane clustering all then behave as on real imagery.

    plane_corners [P,4,3] (tl, tr, bl, br), plane_normal [P,3], plane_d [P]
    with n·x = d (SimPlanes layout).
    """
    w, h = wh
    bear_c = _pixel_bearings(zeta, wh, model)               # [H, W, 3]
    R_GtoC = R_ItoC @ R_GtoI
    c_G = p_IinG - R_GtoC.T @ p_IinC                         # camera center
    dir_G = np.einsum("ij,hwj->hwi", R_GtoC.T, bear_c)       # [H, W, 3]

    P = plane_corners.shape[0]
    tl = plane_corners[:, 0]
    e1 = plane_corners[:, 1] - tl                            # tl→tr
    e2 = plane_corners[:, 2] - tl                            # tl→bl
    l1 = np.linalg.norm(e1, axis=1)
    l2 = np.linalg.norm(e2, axis=1)
    e1u = e1 / l1[:, None]
    e2u = e2 / l2[:, None]

    best_t = np.full((h, w), np.inf)
    tex = np.full((h, w), 0.35, np.float32)
    for p in range(P):
        n = plane_normal[p]
        denom = np.einsum("hwi,i->hw", dir_G, n)
        denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        t_hit = (plane_d[p] - c_G @ n) / denom
        x = c_G[None, None, :] + t_hit[..., None] * dir_G    # [H, W, 3]
        rel = x - tl[p]
        s_c = np.einsum("hwi,i->hw", rel, e1u[p])
        t_c = np.einsum("hwi,i->hw", rel, e2u[p])
        hit = (t_hit > 0.05) & (s_c >= 0) & (s_c <= l1[p]) & (t_c >= 0) & (t_c <= l2[p]) & (t_hit < best_t)
        if not hit.any():
            continue
        # Three octaves: the finest (~2 cm cells) keeps surfaces trackable
        # even at arm's-length viewing distance — a single coarse octave is
        # locally a featureless gradient up close and LK slides on it.
        # Each octave is FADED OUT as its on-screen cell size approaches the
        # pixel pitch (mip-style band-limiting): point-sampling sub-Nyquist
        # noise aliases, and aliased texture decorrelates between viewpoints
        # — measured ~0.7 px of irreducible LK error on a pure-rotation pair,
        # an order of magnitude above the tracker's true accuracy.
        f_px = 0.5 * (zeta[0] + zeta[1])
        cell_px_1 = texture_cell * f_px / np.maximum(t_hit, 0.05)
        octs = []
        wsum = np.zeros_like(t_hit)
        for scale_o, amp_o, ds in ((1.0, 0.5, 0), (0.31, 0.3, 7), (0.093, 0.2, 11)):
            w_o = amp_o * np.clip((cell_px_1 * scale_o - 2.0) / 3.0, 0.0, 1.0)
            n_o = _value_noise(s_c, t_c, texture_cell * scale_o, seed + 13 * p + ds)
            octs.append(w_o * n_o)
            wsum += w_o
        val = 0.18 + 0.55 * np.sum(octs, axis=0) / np.maximum(wsum, 1e-6)
        # Distinctive world-anchored speckle on top of the (self-similar)
        # noise octaves — see _speckle. Multiple speckle scales give corner
        # density at every viewing distance (one coarse layer alone leaves
        # far walls corner-free — the corridor scene's failure mode).
        px_per_m = f_px / np.maximum(t_hit, 0.05)
        for si, sc in enumerate(speckle_cells):
            cell_s, r_lo, r_hi = (sc, 0.05, 0.15) if np.isscalar(sc) else sc
            val = val + _speckle(s_c, t_c, cell_s, seed + 29 * p + 5 + 17 * si,
                                 r_lo=r_lo, r_hi=r_hi, px_per_m=px_per_m)
        val = np.clip(val, 0.02, 1.0)
        best_t = np.where(hit, t_hit, best_t)
        tex = np.where(hit, val.astype(np.float32), tex)

    img = tex
    if blobs:
        # Feature blobs on top (exact anchors for FAST/the measurement model).
        # blobs=False is the realistic regime: FAST then detects on the plane
        # texture itself (world-anchored speckle dots), so every detection has
        # an exact ray/plane-intersection ground truth — the blob overlays are
        # measurement-model anchors but their texture is NOT world-anchored
        # to the plane, which decorrelates under viewpoint change.
        blob = render_frame(feat_p, R_GtoI, p_IinG, R_ItoC, p_IinC, zeta, wh,
                            model=model, patch_world=feat_patch_world, seed=seed)
        mask = blob > 0.12                                   # blob footprint
        img = np.where(mask, blob, img)
    return np.clip(img, 0.0, 1.0)
