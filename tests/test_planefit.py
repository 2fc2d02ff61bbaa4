"""Plane fitting / refinement tests (reference: PlaneFitting.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.ops.planefit import (
    PlaneRefineOptions,
    fit_plane_lsq,
    refine_plane_joint,
    refine_point_on_plane,
)

RNG = np.random.default_rng(7)


def make_plane_points(n, cp, noise=0.0, rng=RNG):
    d = np.linalg.norm(cp)
    nvec = cp / d
    # Basis in the plane.
    a = np.array([1.0, 0.0, 0.0])
    if abs(nvec @ a) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    u = np.cross(nvec, a)
    u /= np.linalg.norm(u)
    v = np.cross(nvec, u)
    coords = rng.uniform(-2, 2, size=(n, 2))
    pts = d * nvec + coords[:, :1] * u + coords[:, 1:] * v
    pts += noise * rng.normal(size=pts.shape)
    return pts


def test_fit_plane_lsq_recovers_cp():
    cp_true = np.array([0.5, -1.0, 2.0])
    pts = make_plane_points(40, cp_true)
    cp, cond, ok = fit_plane_lsq(jnp.asarray(pts), jnp.ones(40, bool))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(cp), cp_true, atol=1e-8)


def test_fit_plane_lsq_masked():
    cp_true = np.array([0.0, 0.0, 1.5])
    pts = make_plane_points(30, cp_true)
    garbage = RNG.normal(size=(10, 3)) * 100
    all_pts = np.vstack([pts, garbage])
    mask = np.concatenate([np.ones(30, bool), np.zeros(10, bool)])
    cp, _, ok = fit_plane_lsq(jnp.asarray(all_pts), jnp.asarray(mask))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(cp), cp_true, atol=1e-8)


def _camera_ring(n_cams, center, radius=3.0):
    """Simple camera rig looking at `center` from a ring."""
    Rs, ps = [], []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams * 0.3
        c = center + radius * np.array([np.cos(ang), np.sin(ang), 0.4 * np.sin(ang + 1)])
        z = center - c
        z = z / np.linalg.norm(z)
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_CtoG = np.stack([x, y, z], axis=1)
        Rs.append(R_CtoG.T)  # R_GtoC
        ps.append(c)
    return np.stack(Rs), np.stack(ps)


def test_refine_plane_joint_converges():
    cp_true = np.array([0.0, 0.0, 2.0])
    N, K = 12, 6
    feats_true = make_plane_points(N, cp_true, rng=np.random.default_rng(3))
    R_GtoC, p_CinG = _camera_ring(K, np.array([0.0, 0.0, 2.0]))
    # Perfect normalized observations.
    uvn = np.zeros((N, K, 2))
    mask = np.zeros((N, K), bool)
    for i in range(N):
        for k in range(K):
            pc = R_GtoC[k] @ (feats_true[i] - p_CinG[k])
            if pc[2] > 0.2:
                uvn[i, k] = pc[:2] / pc[2]
                mask[i, k] = True
    # Perturb initial guesses (within the 3 cm re-acceptance bound — real
    # callers seed from triangulation, whose error tracks the observations).
    rng = np.random.default_rng(5)
    feats0 = feats_true + 0.01 * rng.normal(size=feats_true.shape)
    cp0 = cp_true + np.array([0.05, -0.03, 0.08])
    opts = PlaneRefineOptions(iters=15, sigma_px=1e-3, sigma_c=0.05)
    cp, feats, ok, inl = refine_plane_joint(
        jnp.asarray(cp0), jnp.asarray(feats0), jnp.asarray(uvn), jnp.asarray(mask),
        jnp.ones(N, bool), jnp.zeros(N, bool), jnp.asarray(R_GtoC), jnp.asarray(p_CinG),
        opts,
    )
    assert bool(ok)
    assert bool(jnp.all(inl))  # clean data: every feature re-accepted
    np.testing.assert_allclose(np.asarray(cp), cp_true, atol=2e-3)
    np.testing.assert_allclose(np.asarray(feats), feats_true, atol=2e-3)


def _plane_obs_problem(n_out=0, seed=3):
    """Plane-fit problem with n_out contaminated features (observations of
    points OFF the plane that carry on-plane initial guesses)."""
    cp_true = np.array([0.0, 0.0, 2.0])
    N, K = 12, 6
    feats_true = make_plane_points(N, cp_true, rng=np.random.default_rng(seed))
    pts_obs = feats_true.copy()
    pts_obs[:n_out, 2] += 0.35          # true points are off-plane
    R_GtoC, p_CinG = _camera_ring(K, np.array([0.0, 0.0, 2.0]))
    uvn = np.zeros((N, K, 2))
    mask = np.zeros((N, K), bool)
    for i in range(N):
        for k in range(K):
            pc = R_GtoC[k] @ (pts_obs[i] - p_CinG[k])
            if pc[2] > 0.2:
                uvn[i, k] = pc[:2] / pc[2]
                mask[i, k] = True
    rng = np.random.default_rng(seed + 2)
    # Initial guesses come from triangulation in the real callers, so they
    # track the OBSERVED (off-plane for outliers) positions — exactly the
    # pre-opt points the reference's re-acceptance distance tests
    # (PlaneFitting.cpp:462-464 runs on p_FinG before the overwrite).
    feats0 = pts_obs + 0.01 * rng.normal(size=feats_true.shape)
    cp0 = cp_true + np.array([0.05, -0.03, 0.08])
    return cp_true, pts_obs, feats0, cp0, uvn, mask, R_GtoC, p_CinG


def test_refine_plane_joint_reacceptance_drops_outliers():
    """Contaminated support (features whose observations are OFF the plane)
    must be rejected by the post-opt re-acceptance (PlaneFitting.cpp:452-481:
    |point-to-plane| < max_error_threshold), and the Cauchy loss
    (CauchyLoss(1.0), :256,367) must keep the refined plane near truth
    despite the contamination."""
    cp_true, pts_obs, feats0, cp0, uvn, mask, R_GtoC, p_CinG = _plane_obs_problem(n_out=2)
    N = feats0.shape[0]
    opts = PlaneRefineOptions(iters=15, sigma_px=1e-3, sigma_c=0.05)
    cp, feats, ok, inl = refine_plane_joint(
        jnp.asarray(cp0), jnp.asarray(feats0), jnp.asarray(uvn), jnp.asarray(mask),
        jnp.ones(N, bool), jnp.zeros(N, bool), jnp.asarray(R_GtoC), jnp.asarray(p_CinG),
        opts,
    )
    inl = np.asarray(inl)
    assert bool(ok)                      # 10/12 survivors = max(4, ceil(0.8·12))
    assert not inl[:2].any()             # the contaminated pair is dropped
    assert inl[2:].all()
    # Robust plane estimate: contamination pulled the quadratic fit by the
    # outliers' 0.35 m offset; the Cauchy refine stays within 3 cm.
    assert np.linalg.norm(np.asarray(cp) - cp_true) < 0.03


def test_refine_plane_joint_group_fails_when_majority_outliers():
    """When fewer than max(4, 0.8·n) features survive re-acceptance, the
    whole refine reports failure (PlaneFitting.cpp:487-495) — the caller
    must skip the plane group."""
    cp_true, pts_obs, feats0, cp0, uvn, mask, R_GtoC, p_CinG = _plane_obs_problem(n_out=6)
    N = feats0.shape[0]
    opts = PlaneRefineOptions(iters=15, sigma_px=1e-3, sigma_c=0.05)
    _, _, ok, inl = refine_plane_joint(
        jnp.asarray(cp0), jnp.asarray(feats0), jnp.asarray(uvn), jnp.asarray(mask),
        jnp.ones(N, bool), jnp.zeros(N, bool), jnp.asarray(R_GtoC), jnp.asarray(p_CinG),
        opts,
    )
    assert not bool(ok)
    assert int(np.asarray(inl).sum()) < 10


def test_refine_point_on_plane_projects():
    cp = jnp.asarray([0.0, 0.0, 2.0])
    R_GtoC, p_CinG = _camera_ring(4, np.array([0.3, -0.2, 2.0]))
    p_true = np.array([0.3, -0.2, 2.0])  # on the plane z=2
    uvn = np.zeros((4, 2))
    mask = np.ones(4, bool)
    for k in range(4):
        pc = R_GtoC[k] @ (p_true - p_CinG[k])
        uvn[k] = pc[:2] / pc[2]
    p0 = p_true + np.array([0.02, 0.01, 0.05])
    opts = PlaneRefineOptions(iters=15, sigma_px=1e-3, sigma_c=0.01)
    p = refine_point_on_plane(jnp.asarray(p0), cp, jnp.asarray(uvn), jnp.asarray(mask),
                              jnp.asarray(R_GtoC), jnp.asarray(p_CinG), opts)
    np.testing.assert_allclose(np.asarray(p), p_true, atol=1e-4)
    # Residual to the plane should be tiny.
    assert abs(float(p[2]) - 2.0) < 1e-3


def test_plane_ransac_rejects_outliers():
    """RANSAC recovers the plane despite 20% gross outliers that bias plain
    LSQ (PlaneFitting::plane_fitting parity, PlaneFitting.cpp:83-195)."""
    from ov_plane_tpu.ops.planefit import PlaneRansacOptions, plane_ransac

    rng = np.random.default_rng(42)
    cp_true = np.array([0.3, -0.8, 1.7])
    inl = make_plane_points(40, cp_true, noise=0.005, rng=rng)
    out = rng.uniform(-3, 3, size=(10, 3)) + np.array([0, 0, 5.0])
    pts = np.vstack([inl, out])
    mask = np.ones(50, bool)

    opts = PlaneRansacOptions(num_hyps=64, inlier_thresh=0.03, min_inlier_ratio=0.5)
    cp, inliers, ok = plane_ransac(jnp.asarray(pts), jnp.asarray(mask), jax.random.PRNGKey(0), opts)
    assert bool(ok)
    inliers = np.asarray(inliers)
    # All true outliers rejected, most true inliers kept.
    assert not inliers[40:].any()
    assert inliers[:40].sum() >= 35
    np.testing.assert_allclose(np.asarray(cp), cp_true, atol=0.02)

    # Plain LSQ on the same contaminated set is visibly biased.
    cp_lsq, _, _ = fit_plane_lsq(jnp.asarray(pts), jnp.asarray(mask))
    assert np.linalg.norm(np.asarray(cp_lsq) - cp_true) > 0.05


def test_plane_ransac_masked_and_degenerate():
    """Invalid rows are never sampled; too-few points → ok=False."""
    from ov_plane_tpu.ops.planefit import PlaneRansacOptions, plane_ransac

    rng = np.random.default_rng(43)
    cp_true = np.array([0.0, 0.0, 2.0])
    pts = np.vstack([make_plane_points(20, cp_true, rng=rng), rng.normal(size=(30, 3)) * 50])
    mask = np.concatenate([np.ones(20, bool), np.zeros(30, bool)])
    opts = PlaneRansacOptions(num_hyps=32, inlier_thresh=0.02)
    cp, inliers, ok = plane_ransac(jnp.asarray(pts), jnp.asarray(mask), jax.random.PRNGKey(1), opts)
    assert bool(ok)
    assert not np.asarray(inliers)[20:].any()
    np.testing.assert_allclose(np.asarray(cp), cp_true, atol=1e-6)

    # Fewer valid points than the sample size: rejected.
    mask3 = np.zeros(50, bool)
    mask3[:3] = True
    _, _, ok3 = plane_ransac(jnp.asarray(pts), jnp.asarray(mask3), jax.random.PRNGKey(2), opts)
    assert not bool(ok3)
