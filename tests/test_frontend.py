"""Vision frontend tests on synthetic imagery: KLT tracks a known warp, FAST
finds checkerboard corners, the plane tracker clusters two synthetic planes."""

import jax
import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.frontend import fast as ffast
from ov_plane_tpu.frontend import klt as fklt
from ov_plane_tpu.frontend.plane_track import PlaneTracker
from ov_plane_tpu.utils.config import TrackPlaneOptions

RNG = np.random.default_rng(21)


def _texture(h, w, seed=0):
    """Smooth random texture with plenty of gradient."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, size=(h // 4, w // 4))
    img = np.kron(img, np.ones((4, 4)))
    # Light smoothing for subpixel interpolation friendliness.
    k = np.array([0.25, 0.5, 0.25])
    for _ in range(2):
        img = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 0, img)
        img = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, img)
    return img.astype(np.float32)


def _shift_image(img, dx, dy):
    """Bilinear shift: output(x) = input(x - d)."""
    h, w = img.shape
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    xs = np.clip(xx - dx, 0, w - 1.001)
    ys = np.clip(yy - dy, 0, h - 1.001)
    x0 = xs.astype(int)
    y0 = ys.astype(int)
    fx = xs - x0
    fy = ys - y0
    return (
        img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, np.minimum(x0 + 1, w - 1)] * fx * (1 - fy)
        + img[np.minimum(y0 + 1, h - 1), x0] * (1 - fx) * fy
        + img[np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)] * fx * fy
    ).astype(np.float32)


def test_klt_tracks_known_shift():
    img0 = _texture(120, 160)
    dx, dy = 6.3, -3.7
    img1 = _shift_image(img0, dx, dy)
    opts = fklt.KltOptions(levels=3, window=7, iters=12)
    pyr0 = tuple(fklt.build_pyramid(jnp.asarray(img0), opts.levels))
    pyr1 = tuple(fklt.build_pyramid(jnp.asarray(img1), opts.levels))
    pts = jnp.asarray(RNG.uniform([25, 25], [135, 95], size=(30, 2)))
    p1, ok = fklt.track(pyr0, pyr1, pts, jnp.ones(30, bool), opts)
    ok = np.asarray(ok)
    assert ok.sum() >= 20, f"only {ok.sum()} tracked"
    flow = np.asarray(p1)[ok] - np.asarray(pts)[ok]
    np.testing.assert_allclose(flow.mean(axis=0), [dx, dy], atol=0.15)
    assert np.max(np.abs(flow - [dx, dy])) < 0.8


def test_klt_matmul_sampler_matches_slice():
    """The MXU one-hot-matmul patch sampler (sampler='mm') is the TPU form of
    the dynamic_slice sampler: identical tracks to f32 rounding, and the bf16
    variant stays within a few hundredths of a pixel (under the noise floor)."""
    img0 = _texture(120, 160, seed=3)
    img1 = _shift_image(img0, 2.3, -1.7)
    pyr0 = tuple(fklt.build_pyramid(jnp.asarray(img0), 3))
    pyr1 = tuple(fklt.build_pyramid(jnp.asarray(img1), 3))
    pts = jnp.asarray(RNG.uniform([25, 25], [135, 95], size=(24, 2)), jnp.float32)
    mask = jnp.ones(24, bool)
    res = {}
    for sampler in ("slice", "mm", "mm_bf16"):
        o = fklt.KltOptions(levels=3, window=7, iters=8, fb_check=False,
                            sampler=sampler)
        p, ok = fklt.track(pyr0, pyr1, pts, mask, o)
        res[sampler] = (np.asarray(p), np.asarray(ok))
    both = res["slice"][1] & res["mm"][1]
    assert both.sum() >= 16
    np.testing.assert_allclose(res["mm"][0][both], res["slice"][0][both],
                               atol=1e-3)
    bothb = res["slice"][1] & res["mm_bf16"][1]
    np.testing.assert_allclose(res["mm_bf16"][0][bothb], res["slice"][0][bothb],
                               atol=0.1)
    # Patch-level exactness of the selector contraction.
    from ov_plane_tpu.frontend.klt import (_bilinear_patch, _pad_edge,
                                           _sample_batch)
    pad = _pad_edge(jnp.asarray(img0), 7)
    Pm = _sample_batch(pad[None], pts, 7, jnp.float32)[0]
    Ps = jax.vmap(lambda c: _bilinear_patch(pad, c, 7))(pts)
    np.testing.assert_allclose(np.asarray(Pm), np.asarray(Ps), atol=2e-6)


def test_klt_rejects_featureless():
    img0 = np.zeros((96, 96), np.float32)
    opts = fklt.KltOptions(levels=2, window=7)
    pyr0 = tuple(fklt.build_pyramid(jnp.asarray(img0), opts.levels))
    pts = jnp.asarray([[48.0, 48.0]])
    _, ok = fklt.track(pyr0, pyr0, pts, jnp.ones(1, bool), opts)
    assert not bool(ok[0])


def test_fast_finds_square_corners():
    # Isolated bright squares: FAST-9 fires near their corners (a checkerboard
    # saddle point has no ≥9-contiguous arc — classic FAST rejects those).
    h, w = 120, 160
    img = np.zeros((h, w), np.float32)
    sq = 12
    centers = []
    for ci in range(2):
        for cj in range(3):
            y0, x0 = 20 + ci * 50, 20 + cj * 50
            img[y0:y0 + sq, x0:x0 + sq] = 1.0
            centers += [(x0, y0), (x0 + sq - 1, y0), (x0, y0 + sq - 1), (x0 + sq - 1, y0 + sq - 1)]
    opts = ffast.FastOptions(threshold=0.2, grid_x=8, grid_y=6, max_features=40)
    uv, valid = ffast.detect_grid(
        jnp.asarray(img), jnp.zeros((1, 2)), jnp.zeros(1, bool), opts, h, w
    )
    uv = np.asarray(uv)[np.asarray(valid)]
    assert len(uv) >= 6, f"only {len(uv)} detections"
    corners = np.asarray(centers, float)
    for u, v in uv:
        d = np.min(np.linalg.norm(corners - [u, v], axis=1))
        assert d < 5.0, (u, v, d)


def test_fast_respects_occupancy():
    h, w = 120, 160
    img = np.zeros((h, w), np.float32)
    img[40:80, 60:100] = 1.0  # one bright square → corners at its 4 corners
    opts = ffast.FastOptions(threshold=0.2, grid_x=8, grid_y=6, max_features=10)
    occupied = jnp.asarray([[60.0, 40.0]])  # cover the top-left corner's cell
    uv, valid = ffast.detect_grid(jnp.asarray(img), occupied, jnp.ones(1, bool), opts, h, w)
    uv = np.asarray(uv)[np.asarray(valid)]
    assert len(uv) >= 1
    cw, ch = w / 8, h / 6
    occ_cell = (60 // cw, 40 // ch)
    for u, v in uv:
        assert (u // cw, v // ch) != occ_cell


def test_plane_tracker_clusters_two_planes():
    # Scene: floor z=0 and wall y=3; camera at origin looking +y, z up-ish.
    rng = np.random.default_rng(3)
    n_each = 25
    floor = np.stack([rng.uniform(-2, 2, n_each), rng.uniform(1.5, 4, n_each), np.zeros(n_each)], axis=1)
    wall = np.stack([rng.uniform(-2, 2, n_each), np.full(n_each, 4.5), rng.uniform(0.2, 2, n_each)], axis=1)
    pts3 = np.vstack([floor, wall])
    ids = np.arange(len(pts3))
    # Camera: x right, y down (-z world), z forward (+y world); center at (0,0,1).
    R_GtoC = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])
    p_CinG = np.array([0.0, 0.0, 1.0])
    pc = (R_GtoC @ (pts3 - p_CinG).T).T
    uv = 300 * pc[:, :2] / pc[:, 2:3] + np.array([320, 240])

    tracker = PlaneTracker(TrackPlaneOptions(min_norms=2, max_pairwise_px=500, max_tri_side_px=500))
    for _ in range(4):  # a few frames to build norm history
        f2p, p2old = tracker.update(ids, uv, pts3, np.ones(len(ids), bool), R_GtoC, p_CinG)

    assert len(f2p) > 20, f"too few plane features: {len(f2p)}"
    floor_labels = {f2p[i] for i in range(n_each) if i in f2p}
    wall_labels = {f2p[i + n_each] for i in range(n_each) if (i + n_each) in f2p}
    assert len(floor_labels) == 1, floor_labels
    assert len(wall_labels) == 1, wall_labels
    assert floor_labels != wall_labels


def test_equalize_hist_flattens_distribution():
    from ov_plane_tpu.frontend import imageproc as ip

    rng = np.random.default_rng(5)
    img = np.clip(rng.beta(8, 2, size=(64, 64)), 0, 1).astype(np.float32)  # skewed bright
    out = np.asarray(ip.equalize_hist(jnp.asarray(img)))
    assert out.shape == img.shape
    assert 0.0 <= out.min() and out.max() <= 1.0
    # Equalization spreads mass: the output histogram is much flatter.
    h_in, _ = np.histogram(img, bins=16, range=(0, 1))
    h_out, _ = np.histogram(out, bins=16, range=(0, 1))
    assert h_out.std() < 0.5 * h_in.std()
    # Monotone: ordering of intensities preserved.
    a, b = img[10, 10], img[20, 20]
    if abs(a - b) > 0.05:
        assert (a < b) == (out[10, 10] <= out[20, 20])


def test_clahe_improves_local_contrast():
    from ov_plane_tpu.frontend import imageproc as ip

    img = np.full((64, 64), 0.5, np.float32)
    img[:32] = 0.48 + 0.04 * np.random.default_rng(0).random((32, 64)).astype(np.float32)
    img[32:] = 0.9 + 0.05 * np.random.default_rng(1).random((32, 64)).astype(np.float32)
    out = np.asarray(ip.clahe(jnp.asarray(img), tiles=4))
    # Local contrast in the dark half increases.
    assert out[:32].std() > img[:32].std()
    assert np.isfinite(out).all()


def test_ray_rms_accumulator_matches_direct_sum():
    """The (A, b, c) quadratic accumulated by the pipeline (one rank-1 update
    per observation, pipeline.py step 0b) reproduces the direct per-ray
    perpendicular-distance sum: a clean track's RMS ~ noise level, a track
    with one gross mistrack blows past the gate."""
    rng = np.random.default_rng(3)
    p_gt = np.array([1.0, -0.5, 4.0])
    centers = rng.uniform(-1, 1, size=(8, 3))

    def accumulate(bearing_noise, corrupt_one=False):
        A = np.zeros((3, 3))
        b = np.zeros(3)
        c = 0.0
        dists2 = []
        for k, ci in enumerate(centers):
            d = p_gt - ci
            d = d / np.linalg.norm(d)
            d = d + bearing_noise * rng.normal(size=3)
            if corrupt_one and k == 3:
                d = d + np.array([0.4, -0.3, 0.2])  # gross mistrack
            d = d / np.linalg.norm(d)
            Ai = np.eye(3) - np.outer(d, d)
            A += Ai
            b += Ai @ ci
            c += ci @ Ai @ ci
            dists2.append(p_gt @ Ai @ p_gt - 2 * ci @ Ai @ p_gt + ci @ Ai @ ci)
        quad = p_gt @ A @ p_gt - 2 * b @ p_gt + c
        np.testing.assert_allclose(quad, np.sum(dists2), rtol=1e-10, atol=1e-12)
        return np.sqrt(max(quad, 0.0) / len(centers))

    assert accumulate(0.0) < 1e-9  # exact rays meet exactly
    clean = accumulate(0.002)
    bad = accumulate(0.002, corrupt_one=True)
    depth = np.linalg.norm(p_gt)
    gate = max(0.03 * depth, 0.10)  # TrackPlaneOptions defaults
    assert clean < gate, (clean, gate)
    assert bad > gate, (bad, gate)
