"""Plane estimation from sparse points: closed-form fit + joint GN refinement.

Re-design of ``PlaneFitting`` (track_plane/PlaneFitting.cpp):

* :func:`fit_plane_lsq` — the linear A·x = −1 fit with condition-number gate
  (fit_plane :43-81), masked/batched;
* :func:`refine_plane_joint` — the Ceres ``optimize_plane`` (:197-514)
  replaced by a fixed-iteration Gauss-Newton with analytic Schur elimination:
  features (3 dof each) are eliminated in closed form per iteration, leaving a
  3×3 CP system — the same DENSE_SCHUR structure Ceres exploits, but batched
  and jit-compiled. Poses are constants (as in the reference: only features +
  plane optimize). Huber-style reweighting approximates the Cauchy loss.
* :func:`refine_point_on_plane` — project a single feature onto a fixed plane
  by GN on (reprojection + constraint) residuals (used by the SLAM
  plane-refined delayed init, UpdaterSLAM.cpp:147-202).

CP convention matches the reference: plane normal n = cp/‖cp‖, offset
d = ‖cp‖, point-on-plane residual (n·p − d)/σc.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.ops.ekf import inv3
from ov_plane_tpu.ops.triangulation import eigvals_sym3


class PlaneRansacOptions(NamedTuple):
    num_hyps: int = 64
    sample_size: int = 5
    inlier_thresh: float = 0.05      # |n·p − d| in meters
    min_inlier_ratio: float = 0.80   # accept gate (inliers / valid points)
    min_spacing: float = 0.10        # min pairwise distance within a sample


class PlaneRefineOptions(NamedTuple):
    iters: int = 10
    lam_init: float = 1e-4
    sigma_px: float = 1.0
    sigma_c: float = 0.05
    slam_sigma_multi: float = 2.0   # inflation for fixed SLAM feats (PlaneFitting.cpp:330)
    # Reprojection residuals here live in NORMALIZED image coordinates, so
    # their whitening is focal/sigma_px — the reference passes
    # sigma_px_norm = sigma_px/focal to optimize_plane (UpdaterMSCKF.cpp:279).
    # focal=1.0 keeps sigma_px interpretable as a normalized sigma directly
    # (unit-test convention); VioEngine.from_config sets the camera's mean
    # focal. Round-5 measured consequence of leaving this at the PIXEL
    # whitening (weight 0.5 vs the constraint's 20): the joint GN dragged
    # support features fully onto the fitted plane, and the grouped plane
    # updates then fed every member's coherently-biased reprojection rows to
    # the filter — +259% position ATE on the 20-seed tabletop campaign.
    focal: float = 1.0
    # Cauchy robust loss scale on the WHITENED residuals — the reference wraps
    # every reprojection and point-on-plane factor in ceres::CauchyLoss(1.0)
    # (PlaneFitting.cpp:256,367); IRLS weight w = 1/(1 + s/a²), s = ‖r‖².
    # 0.0 disables (plain quadratic GN).
    cauchy_scale: float = 1.0
    # Post-optimization inlier re-acceptance (PlaneFitting.cpp:452-495): a
    # feature survives iff its pre-opt point is within this point-to-plane
    # distance of the refined plane, its refined point is finite and in front
    # of its newest observing camera, and the group keeps
    # ≥ max(4, min_inlier_ratio·n) survivors — else the whole refine FAILS.
    # 0.0 disables (keep all features, the pre-round-5 behavior).
    max_error_threshold: float = 0.03
    min_inlier_ratio: float = 0.80


def fit_plane_lsq(points, mask):
    """Least-squares plane through masked points.

    Solves A x = −1 (rows = point coordinates); returns (cp[3], cond, ok).
    cond = sqrt(λmax/λmin) of AᵀA — the reference's singular-value ratio gate
    (PlaneFitting.cpp:43-81).
    """
    m = mask.astype(points.dtype)
    A = points * m[:, None]
    AtA = A.T @ A
    Atb = -jnp.sum(A, axis=0)
    x = inv3(AtA) @ Atb
    eig = eigvals_sym3(AtA)
    cond = jnp.sqrt(jnp.abs(eig[2]) / jnp.maximum(jnp.abs(eig[0]), 1e-18))
    norm_x = jnp.linalg.norm(x)
    ok = (jnp.sum(mask) >= 3) & (norm_x > 1e-9) & jnp.all(jnp.isfinite(x))
    # Plane x·p + 1 = 0  →  n = −x/‖x‖, d = 1/‖x‖, cp = n·d = −x/‖x‖².
    cp = -x / jnp.maximum(norm_x**2, 1e-18)
    return cp, cond, ok


@functools.partial(jax.jit, static_argnames=("opts",))
def plane_ransac(points, mask, key, opts: PlaneRansacOptions):
    """Robust plane fit by batched hypothesis search.

    Re-design of the reference's sequential 5-point RANSAC
    (PlaneFitting::plane_fitting, track_plane/PlaneFitting.cpp:83-195:
    min-spacing sample rejection, point-to-plane inlier count, inlier-ratio
    acceptance, final refit on the consensus set). Instead of an early-exit
    loop, ALL ``num_hyps`` hypotheses are drawn and scored as one vmap —
    the TPU-shaped equivalent (fixed trip count, masked validity).

    points [N,3]; mask [N] valid flags; key: PRNG key (hypothesis sampling is
    deterministic given the key, mirroring the reference's fixed seed).
    Returns (cp[3], inliers[N] bool, ok).
    """
    dtype = points.dtype
    N = points.shape[0]
    S = opts.sample_size
    n_valid = jnp.sum(mask)

    def one_hyp(k):
        # S distinct valid indices: top-k of random scores, invalid rows sunk.
        scores = jnp.where(mask, jax.random.uniform(k, (N,), dtype), -jnp.inf)
        _, idx = jax.lax.top_k(scores, S)
        pts = points[idx]
        # Min-spacing rejection (reference re-draws; we mask the hypothesis).
        d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        d2 = d2 + jnp.eye(S, dtype=dtype) * 1e9
        spaced = jnp.min(d2) > opts.min_spacing**2
        cp, _, fit_ok = fit_plane_lsq(pts, jnp.ones((S,), bool))
        d = jnp.maximum(jnp.linalg.norm(cp), 1e-9)
        n = cp / d
        dist = jnp.abs(points @ n - d)
        inl = (dist < opts.inlier_thresh) & mask
        cnt = jnp.sum(inl)
        hyp_ok = spaced & fit_ok & (n_valid >= S)
        return jnp.where(hyp_ok, cnt, -1), inl

    keys = jax.random.split(key, opts.num_hyps)
    counts, inls = jax.vmap(one_hyp)(keys)
    best = jnp.argmax(counts)
    inliers = inls[best]
    n_inl = counts[best]
    ok = (n_inl.astype(dtype) >= opts.min_inlier_ratio * jnp.maximum(n_valid, 1).astype(dtype)) & (n_inl >= S)
    # Final consensus refit (reference refits abcd on the inlier set).
    cp, _, refit_ok = fit_plane_lsq(points, inliers)
    return cp, inliers, ok & refit_ok


def _reproj_system(p, uvn, mask, R_GtoC, p_CinG, white_px):
    """Whitened reprojection residuals + Jacobians for one feature.
    Returns (r [K,2], J [K,2,3])."""
    p_FinC = jnp.einsum("kij,kj->ki", R_GtoC, p[None, :] - p_CinG)
    z = jnp.where(jnp.abs(p_FinC[:, 2]) < 1e-6, 1e-6, p_FinC[:, 2])
    pred = p_FinC[:, :2] / z[:, None]
    r = (uvn - pred) * mask[:, None] * white_px
    dz = jnp.stack(
        [
            jnp.stack([1.0 / z, jnp.zeros_like(z), -p_FinC[:, 0] / z**2], axis=1),
            jnp.stack([jnp.zeros_like(z), 1.0 / z, -p_FinC[:, 1] / z**2], axis=1),
        ],
        axis=1,
    )
    J = -jnp.einsum("kab,kbc->kac", dz, R_GtoC) * mask[:, None, None] * white_px
    return r, J


def _plane_residual(p, cp, white_c):
    """e = wc·(n·p − d) and its Jacobians wrt p and cp (Factor_PointOnPlane
    analytic Jacobians, ceres/Factor_PointOnPlane.cpp:39-72)."""
    d = jnp.linalg.norm(cp)
    d = jnp.maximum(d, 1e-9)
    n = cp / d
    e = (n @ p - d) * white_c
    J_p = n * white_c
    J_cp = (p - (n @ p) * n - d * n) / d * white_c
    return e, J_p, J_cp


@functools.partial(jax.jit, static_argnames=("opts",))
def refine_plane_joint(cp0, feats0, uvn, mask, feat_valid, is_fixed,
                       R_GtoC, p_CinG, opts: PlaneRefineOptions):
    """Joint GN over (features, cp) with per-iteration Schur elimination.

    cp0 [3]; feats0 [N,3]; uvn [N,K,2]; mask [N,K]; feat_valid [N];
    is_fixed [N] (SLAM features held fixed, constraint sigma inflated —
    PlaneFitting.cpp:318-336). Returns (cp, feats, ok, inliers[N]):
    `inliers` is the post-opt re-acceptance mask (PlaneFitting.cpp:452-481) —
    callers must drop non-inliers from the plane group; `ok` is False when
    the surviving count falls below max(4, min_inlier_ratio·n)
    (PlaneFitting.cpp:487-495).
    """
    dtype = cp0.dtype
    white_px = opts.focal / opts.sigma_px
    N = feats0.shape[0]
    I3 = jnp.eye(3, dtype=dtype)
    a2 = opts.cauchy_scale**2

    def cauchy_w(s):
        # IRLS weight ρ'(s) of ρ(s) = a²·log(1 + s/a²): rows scale by √w.
        if opts.cauchy_scale <= 0.0:
            return jnp.ones_like(s)
        return 1.0 / (1.0 + s / a2)

    def rho(s):
        if opts.cauchy_scale <= 0.0:
            return s
        return a2 * jnp.log1p(s / a2)

    def iteration(carry, _):
        cp, feats, lam = carry

        white_c = jnp.where(is_fixed, 1.0 / (opts.slam_sigma_multi * opts.sigma_c), 1.0 / opts.sigma_c)

        def per_feat(p, uvn_f, mask_f, wc):
            # e_re = w(meas − pred), A = ∂e_re/∂p; e_pl = wc(n·p − d),
            # b = ∂e_pl/∂p, c = ∂e_pl/∂cp. GN: H = JᵀJ, g = −Jᵀe, x += H⁻¹g.
            # Each residual block carries its Cauchy IRLS weight (the
            # reference's CauchyLoss(1.0) per factor, PlaneFitting.cpp:256,367).
            e_re, A = _reproj_system(p, uvn_f, mask_f, R_GtoC, p_CinG, white_px)
            sw_re = jnp.sqrt(cauchy_w(jnp.sum(e_re**2, axis=1)))     # [K]
            e_re = e_re * sw_re[:, None]
            A = A * sw_re[:, None, None]
            e_pl, b, c = _plane_residual(p, cp, wc)
            sw_pl = jnp.sqrt(cauchy_w(e_pl**2))
            e_pl, b, c = e_pl * sw_pl, b * sw_pl, c * sw_pl
            Hff = jnp.einsum("kai,kaj->ij", A, A) + jnp.outer(b, b)
            gf = -(jnp.einsum("kai,ka->i", A, e_re) + b * e_pl)
            Hfc = jnp.outer(b, c)
            Hcc_i = jnp.outer(c, c)
            gc_i = -c * e_pl
            return Hff, gf, Hfc, Hcc_i, gc_i

        Hff, gf, Hfc, Hcc_i, gc_i = jax.vmap(per_feat)(feats, uvn, mask, white_c)
        vf = (feat_valid & jnp.all(jnp.isfinite(feats), axis=1)).astype(dtype)
        Hff = Hff * vf[:, None, None] + (1 - vf)[:, None, None] * I3[None]
        gf = gf * vf[:, None]
        Hfc = Hfc * vf[:, None, None]
        Hcc_i = Hcc_i * vf[:, None, None]
        gc_i = gc_i * vf[:, None]

        # LM damping on the feature blocks.
        Hff_d = Hff + lam * I3[None] * jnp.maximum(jnp.einsum("nii->n", Hff), 1e-9)[:, None, None] / 3.0
        Hff_inv = jax.vmap(inv3)(Hff_d)
        # Fixed (SLAM) features contribute their plane residual to cp directly
        # but are not eliminated (they don't move).
        frees = ((~is_fixed) & feat_valid).astype(dtype)
        Hfc_free = Hfc * frees[:, None, None]
        HfcT = jnp.swapaxes(Hfc_free, 1, 2)

        Hcc = jnp.sum(Hcc_i, axis=0) - jnp.einsum("nij,njk,nkl->il", HfcT, Hff_inv, Hfc_free)
        gc = jnp.sum(gc_i, axis=0) - jnp.einsum("nij,njk,nk->i", HfcT, Hff_inv, gf * frees[:, None])
        Hcc = Hcc + lam * jnp.maximum(jnp.trace(Hcc), 1e-9) / 3.0 * I3
        dc = inv3(Hcc) @ gc
        df = jnp.einsum("nij,nj->ni", Hff_inv, gf - jnp.einsum("nij,j->ni", Hfc, dc))
        df = df * frees[:, None]

        def cost(cp_c, feats_c):
            # Robustified objective Σρ(s) — the same function the GN step
            # descends, so the LM accept test is consistent with the loss.
            def c_one(p, uvn_f, mask_f, wc, v):
                e_re, _ = _reproj_system(p, uvn_f, mask_f, R_GtoC, p_CinG, white_px)
                e_pl, _, _ = _plane_residual(p, cp_c, wc)
                return (jnp.sum(rho(jnp.sum(e_re**2, axis=1))) + rho(e_pl**2)) * v
            return jnp.sum(jax.vmap(c_one)(feats_c, uvn, mask, white_c, vf))

        c_old = cost(cp, feats)
        cp_new = cp + dc
        feats_new = feats + df
        c_new = cost(cp_new, feats_new)
        better = c_new < c_old
        cp = jnp.where(better, cp_new, cp)
        feats = jnp.where(better, feats_new, feats)
        lam = jnp.where(better, jnp.maximum(lam / 10.0, 1e-10), jnp.minimum(lam * 10.0, 1e6))
        return (cp, feats, lam), c_new

    (cp, feats, _), _ = jax.lax.scan(
        iteration, (cp0, feats0, jnp.asarray(opts.lam_init, dtype)), None, length=opts.iters
    )
    ok = jnp.all(jnp.isfinite(cp)) & (jnp.linalg.norm(cp) > 1e-6)

    # ---- post-opt inlier re-acceptance (PlaneFitting.cpp:452-495) ----------
    if opts.max_error_threshold > 0.0:
        d = jnp.maximum(jnp.linalg.norm(cp), 1e-9)
        n = cp / d
        # Reference semantics: pre-opt point vs the REFINED plane
        # (point_to_plane_distance(feat->p_FinG, plane_abcd) runs before the
        # estimate overwrite, PlaneFitting.cpp:462-464).
        err_pre = jnp.abs(feats0 @ n - d)
        finite = jnp.all(jnp.isfinite(feats), axis=1)
        # In-front-of-camera check (z ≥ 0.1, :471-474) against each feature's
        # newest observing clone (the reference uses the current IMU clone).
        k_idx = jnp.argmax(
            jnp.where(mask, jnp.arange(mask.shape[1])[None, :], -1), axis=1)
        p_C = jnp.einsum("nij,nj->ni", R_GtoC[k_idx], feats - p_CinG[k_idx])
        front = p_C[:, 2] > 0.1
        inl = feat_valid & (err_pre < opts.max_error_threshold) & finite & (front | is_fixed)
        n_valid = jnp.sum(feat_valid)
        need = jnp.maximum(4, jnp.ceil(opts.min_inlier_ratio * n_valid).astype(jnp.int32))
        ok = ok & (jnp.sum(inl) >= need)
    else:
        inl = feat_valid
    return cp, feats, ok, inl


@functools.partial(jax.jit, static_argnames=("opts",))
def refine_point_on_plane(p0, cp, uvn, mask, R_GtoC, p_CinG, opts: PlaneRefineOptions):
    """GN refine a single feature against a FIXED plane (UpdaterSLAM plane-
    refined triangulation). Returns refined p."""
    dtype = p0.dtype
    white_px = opts.focal / opts.sigma_px
    white_c = 1.0 / opts.sigma_c
    I3 = jnp.eye(3, dtype=dtype)

    def body(carry, _):
        p, lam = carry
        e_re, A = _reproj_system(p, uvn, mask, R_GtoC, p_CinG, white_px)
        e_pl, b, _ = _plane_residual(p, cp, white_c)
        H = jnp.einsum("kai,kaj->ij", A, A) + jnp.outer(b, b)
        g = -(jnp.einsum("kai,ka->i", A, e_re) + b * e_pl)
        H = H + lam * I3 * jnp.maximum(jnp.trace(H), 1e-9) / 3.0
        dp = inv3(H) @ g

        def cost(pc):
            rr, _ = _reproj_system(pc, uvn, mask, R_GtoC, p_CinG, white_px)
            rp, _, _ = _plane_residual(pc, cp, white_c)
            return jnp.sum(rr**2) + rp**2

        better = cost(p + dp) < cost(p)
        p = jnp.where(better, p + dp, p)
        lam = jnp.where(better, jnp.maximum(lam / 10.0, 1e-10), jnp.minimum(lam * 10.0, 1e6))
        return (p, lam), None

    (p, _), _ = jax.lax.scan(body, (p0, jnp.asarray(opts.lam_init, dtype)), None, length=opts.iters)
    return p
