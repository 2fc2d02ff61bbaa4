"""Accuracy and consistency metrics.

Equivalents of the reference's in-process RMSE/NEES computation
(ros/ROS1Visualizer.cpp:820-880) and ov_eval's trajectory alignment + ATE
(used by results/*/plot.sh — SURVEY.md §6). All batched jnp ops.

Conventions match the reference: orientation error e_θ = 2·vec(q_est ⊗ q_gt⁻¹)
(JPL small-angle), position error e_p = p_est − p_gt; NEES uses the filter's
own marginal covariance blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ov_plane_tpu.ops.quat import quat_2_rot, quat_inv, quat_multiply


def ori_pos_errors(q_est, p_est, q_gt, p_gt):
    """Per-frame orientation (3) and position (3) errors. Batched over frames."""
    dq = jax.vmap(quat_multiply)(q_est, jax.vmap(quat_inv)(q_gt))
    e_th = 2.0 * dq[:, 0:3]
    e_p = p_est - p_gt
    return e_th, e_p


def rmse_nees(q_est, p_est, cov_th_diag, cov_p_diag, q_gt, p_gt, valid=None):
    """Per-frame RMSE + NEES (diagonal covariance approximation for speed;
    the reference uses the full 3×3 blocks — use `nees_full` for that)."""
    e_th, e_p = ori_pos_errors(q_est, p_est, q_gt, p_gt)
    if valid is None:
        valid = jnp.ones(e_th.shape[0], bool)
    w = valid.astype(e_th.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    rmse_ori_deg = jnp.degrees(jnp.sqrt(jnp.sum(w * jnp.sum(e_th**2, axis=1)) / n))
    rmse_pos = jnp.sqrt(jnp.sum(w * jnp.sum(e_p**2, axis=1)) / n)
    nees_ori = jnp.sum(w * jnp.sum(e_th**2 / jnp.maximum(cov_th_diag, 1e-18), axis=1)) / n
    nees_pos = jnp.sum(w * jnp.sum(e_p**2 / jnp.maximum(cov_p_diag, 1e-18), axis=1)) / n
    return dict(rmse_ori_deg=rmse_ori_deg, rmse_pos=rmse_pos, nees_ori=nees_ori, nees_pos=nees_pos)


def ate_posyaw(p_est, q_est, p_gt, q_gt):
    """ATE RMSE after posyaw (4-dof) alignment, the reference's headline metric
    (ov_eval error_comparison posyaw; Umeyama restricted to yaw+translation).

    Returns (ate_pos_rmse, ate_ori_rmse_deg, R_align, t_align).
    """
    # Yaw-only alignment: find yaw minimizing || Rz p_est + t - p_gt ||.
    mu_e = jnp.mean(p_est, axis=0)
    mu_g = jnp.mean(p_gt, axis=0)
    ec = p_est - mu_e
    gc = p_gt - mu_g
    # M = Σ ec gcᵀ; maximizing tr(Rz M) over Rz = [[c,−s],[s,c]] gives
    # yaw = atan2(M01 − M10, M00 + M11) (Umeyama restricted to Rz).
    M = ec.T @ gc
    yaw = jnp.arctan2(M[0, 1] - M[1, 0], M[0, 0] + M[1, 1])
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    Rz = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], p_est.dtype)
    t = mu_g - Rz @ mu_e
    p_al = p_est @ Rz.T + t
    ate_pos = jnp.sqrt(jnp.mean(jnp.sum((p_al - p_gt) ** 2, axis=1)))
    # Orientation error after alignment: R_err = R_gt (Rz R_est_ItoG)⁻¹ ... use
    # the relative angle between aligned estimate and gt.
    R_est = jax.vmap(quat_2_rot)(q_est)      # R_GtoI
    R_gt = jax.vmap(quat_2_rot)(q_gt)
    R_rel = jnp.einsum("nij,jk,nlk->nil", R_est, Rz.T, R_gt)  # R_est Rzᵀ R_gtᵀ
    tr = R_rel[:, 0, 0] + R_rel[:, 1, 1] + R_rel[:, 2, 2]
    ang = jnp.arccos(jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0))
    ate_ori = jnp.degrees(jnp.sqrt(jnp.mean(ang**2)))
    return ate_pos, ate_ori, Rz, t


def rpe(p_est, q_est, p_gt, q_gt, segment_lengths=(8.0, 16.0, 24.0, 32.0, 40.0, 48.0)):
    """Relative pose error over distance segments (ov_eval ResultTrajectory::
    calculate_rpe protocol): for every start frame, find the frame whose
    accumulated gt path length first exceeds L, compute the relative-pose
    error between estimate and gt over that segment.

    Returns {L: (rpe_ori_deg_rmse, rpe_pos_rmse)} as jnp scalars.
    """
    R_est = jax.vmap(quat_2_rot)(q_est)
    R_gt = jax.vmap(quat_2_rot)(q_gt)
    d = jnp.linalg.norm(jnp.diff(p_gt, axis=0), axis=1)
    s = jnp.concatenate([jnp.zeros(1, p_gt.dtype), jnp.cumsum(d)])
    n = p_gt.shape[0]

    out = {}
    for L in segment_lengths:
        ends = jnp.searchsorted(s, s + L)                     # [n]
        valid = ends < n
        ends = jnp.clip(ends, 0, n - 1)

        def seg_err(i0, i1):
            # Relative transforms: T_rel = T_i0⁻¹ T_i1 in each trajectory.
            dR_gt = R_gt[i1] @ R_gt[i0].T
            dp_gt = jnp.einsum("ij,j->i", R_gt[i0], p_gt[i1] - p_gt[i0])
            dR_est = R_est[i1] @ R_est[i0].T
            dp_est = jnp.einsum("ij,j->i", R_est[i0], p_est[i1] - p_est[i0])
            R_err = dR_est @ dR_gt.T
            tr = R_err[0, 0] + R_err[1, 1] + R_err[2, 2]
            ang = jnp.arccos(jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0))
            return ang, jnp.linalg.norm(dp_est - dp_gt)

        angs, dps = jax.vmap(seg_err)(jnp.arange(n), ends)
        w = valid.astype(p_gt.dtype)
        m = jnp.maximum(jnp.sum(w), 1.0)
        out[L] = (
            jnp.degrees(jnp.sqrt(jnp.sum(w * angs**2) / m)),
            jnp.sqrt(jnp.sum(w * dps**2) / m),
        )
    return out


def nees_full(e, cov_blocks):
    """Full-block NEES: e [N,3], cov_blocks [N,3,3] → [N]. TPU-f64-safe."""
    from ov_plane_tpu.ops.ekf import inv3

    return jax.vmap(lambda C, v: v @ (inv3(C) @ v))(cov_blocks, e)
