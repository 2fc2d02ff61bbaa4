"""Dynamic (in-motion) initialization.

Equivalent of ov_init's ``DynamicInitializer`` linear stage (SURVEY.md §2.3):
with the platform moving, solve the closed-form linear system over a short
window for initial velocity, gravity direction, and feature positions
(Dong-Si & Mourikis / Martinelli construction), using zero-bias IMU
preintegration between the window's camera poses:

    p_k^{I0} = v0·Δt_k − ½ g^{I0} Δt_k² + α_k                (preintegrals α)
    feature f at pose k:  ⌊b̃_{f,k}⌋ (p_f − c_k^{I0}) = 0     (bearing cross)

Unknowns x = [v0 (3), g^{I0} (3), p_f (3F)]; everything is linear, solved via
normal equations + Cholesky (TPU-safe). Gravity magnitude serves as the
quality gate (|‖g‖ − 9.81| small ⇒ the solution is geometrically coherent);
the global frame is then defined by rotating gravity onto +z (Gram-Schmidt,
yaw free). ``dynamic_mle_refine`` then mirrors ov_init's MLE stage
(init_dyn_mle_*): an LM shooting problem over [v0, g, bg, ba, features] with
the bias-corrected preintegration re-rolled per iteration (exact Jacobians by
jacfwd through the rollout instead of Ceres + hand-derived preintegration
Jacobians).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.ops.quat import exp_so3, rot_2_quat, skew


class DynInitOptions(NamedTuple):
    num_pose: int = 6            # camera poses used (init_dyn_num_pose)
    max_feats: int = 16          # features used in the linear system
    min_deg: float = 15.0        # required orientation change (init_dyn_min_deg)
    gravity_mag: float = 9.81
    max_gravity_err: float = 0.5  # |‖g‖ − g₀| acceptance gate (m/s²)
    inflation_ori: float = 10.0
    inflation_vel: float = 100.0
    inflation_bg: float = 10.0
    inflation_ba: float = 100.0
    # MLE refinement (ov_init fit_mle / init_dyn_mle_* options): LM iterations
    # over [v0, g, bg, ba, features] with the preintegration re-rolled out per
    # iteration at the current biases. 0 disables.
    mle_iters: int = 12
    mle_sigma_uv: float = 1.0 / 460.0   # normalized-plane pixel sigma (~1px/f)
    mle_sigma_g: float = 0.05           # gravity-magnitude soft constraint
    mle_sigma_bg: float = 0.02          # bias prior stddevs over the window
    mle_sigma_ba: float = 0.10


def _preintegrate(imu_t, imu_w, imu_a, t_poses):
    """Zero-bias preintegration from t_poses[0] to each pose time.

    Returns (R_0k [P,3,3] with R_I0toIk, alpha [P,3], beta [P,3], dt [P]).
    Masked scan over the IMU samples; pose boundaries interpolated by clipping.
    """
    P = t_poses.shape[0]
    t0 = t_poses[0]

    def body(carry, xs):
        R, beta, alpha, t_prev = carry
        ta_r, tb_r, w, a = xs
        ta = jnp.maximum(ta_r, t0)
        tb = tb_r
        dt = jnp.where((tb > ta) & jnp.isfinite(tb - ta), tb - ta, 0.0)
        # R_I0toIk chaining: R_{k+1} = exp(-w dt) R_k ; integrals in I0 frame.
        a_I0 = R.T @ a
        alpha_n = alpha + beta * dt + 0.5 * a_I0 * dt * dt
        beta_n = beta + a_I0 * dt
        R_n = exp_so3(-w * dt) @ R
        return (R_n, beta_n, alpha_n, tb), (R_n, beta_n, alpha_n, tb)

    init = (jnp.eye(3, dtype=imu_w.dtype), jnp.zeros(3, imu_w.dtype), jnp.zeros(3, imu_w.dtype), t0)
    _, (R_all, beta_all, alpha_all, t_all) = jax.lax.scan(
        body, init, (imu_t[:-1], imu_t[1:], imu_w[:-1], imu_a[:-1])
    )

    # Sample the preintegrals at each pose time, interpolating the fractional
    # last interval (IMU samples don't land exactly on camera times).
    def at_time(tp):
        # R_all[j]/alpha_all[j] hold integrals up to imu_t[j+1].
        j = jnp.clip(jnp.searchsorted(imu_t, tp) - 2, 0, R_all.shape[0] - 1)
        t_base = imu_t[j + 1]
        delta = jnp.clip(tp - t_base, 0.0, None)
        R_j, beta_j, alpha_j = R_all[j], beta_all[j], alpha_all[j]
        w_next = imu_w[jnp.clip(j + 1, 0, imu_w.shape[0] - 1)]
        a_next = imu_a[jnp.clip(j + 1, 0, imu_a.shape[0] - 1)]
        a_I0 = R_j.T @ a_next
        alpha_p = alpha_j + beta_j * delta + 0.5 * a_I0 * delta * delta
        beta_p = beta_j + a_I0 * delta
        R_p = exp_so3(-w_next * delta) @ R_j
        return R_p, beta_p, alpha_p

    R_0k, beta_k, alpha_k = jax.vmap(at_time)(t_poses)
    dt_k = t_poses - t0
    # Pose 0 exact identities.
    R_0k = R_0k.at[0].set(jnp.eye(3, dtype=imu_w.dtype))
    alpha_k = alpha_k.at[0].set(0.0)
    beta_k = beta_k.at[0].set(0.0)
    return R_0k, alpha_k, beta_k, dt_k


@functools.partial(jax.jit, static_argnames=("opts",))
def dynamic_initialize(imu_t, imu_w, imu_a, t_poses, uvn, obs_mask,
                       R_ItoC, p_IinC, opts: DynInitOptions):
    """Solve the linear dynamic-init system.

    imu_t/w/a: window IMU samples (padded with +inf times);
    t_poses: [P] camera times (ascending, within the IMU window);
    uvn: [P, F, 2] normalized observations of F candidate features;
    obs_mask: [P, F]; (R_ItoC, p_IinC): camera extrinsics.

    Returns (ok, q_GtoI0, v0_G, g_err, p_f_G [F, 3], feat_ok [F]).
    """
    dtype = uvn.dtype
    P, F = uvn.shape[0], uvn.shape[1]
    R_0k, alpha_k, beta_k, dt_k = _preintegrate(imu_t, imu_w, imu_a, t_poses)

    # Orientation-change gate (init_dyn_min_deg).
    ang = jnp.degrees(jnp.arccos(jnp.clip(0.5 * (jnp.trace(R_0k[-1]) - 1.0), -1.0, 1.0)))
    enough_rot = ang >= opts.min_deg

    # Bearings + camera centers in the I0 frame: R_c = R_{Ik→I0} R_{C→I}.
    bear_c = jnp.concatenate([uvn, jnp.ones((P, F, 1), dtype)], axis=2)
    R_c = jnp.swapaxes(R_0k, 1, 2) @ R_ItoC.T            # R_0kᵀ R_ItoCᵀ : [P, 3, 3]
    b_I0 = jnp.einsum("kij,kfj->kfi", R_c, bear_c)       # [P, F, 3]
    cam_off = -jnp.einsum("kij,j->ki", R_c, p_IinC)      # [P, 3]

    # Rows: ⌊b̃⌋ p_f − ⌊b̃⌋ v0·Δt + ½⌊b̃⌋ g·Δt² = ⌊b̃⌋(α_k + cam_off_k)
    # Unknown layout: [v0(0:3) | g(3:6) | p_f (6+3f)].
    n_unk = 6 + 3 * F
    Bx = skew(b_I0.reshape(P * F, 3)).reshape(P, F, 3, 3)
    m = obs_mask[..., None, None].astype(dtype)
    A_v = -Bx * dt_k[:, None, None, None] * m                       # [P, F, 3, 3]
    A_g = 0.5 * Bx * (dt_k**2)[:, None, None, None] * m
    A_f = Bx * m
    rhs = jnp.einsum("kfij,kj->kfi", Bx * m, alpha_k + cam_off)     # [P, F, 3]

    # Normal equations assembled blockwise (n_unk ≤ 6 + 3·16 = 54).
    rows_v = A_v.reshape(P * F * 3, 3)
    rows_g = A_g.reshape(P * F * 3, 3)
    rows_r = rhs.reshape(P * F * 3)
    # Feature blocks: A_f only touches its own columns.
    A_vg = jnp.concatenate([rows_v, rows_g], axis=1)                # [R, 6]
    AtA = jnp.zeros((n_unk, n_unk), dtype)
    Atb = jnp.zeros((n_unk,), dtype)
    AtA = AtA.at[0:6, 0:6].set(A_vg.T @ A_vg)
    Atb = Atb.at[0:6].set(A_vg.T @ rows_r)
    Af = A_f.reshape(P, F, 3, 3)
    for_f_vg = jnp.einsum("kfab,kfac->fbc", Af, A_vg.reshape(P, F, 3, 6))  # [F, 3, 6]
    for_f_ff = jnp.einsum("kfab,kfac->fbc", Af, Af)                        # [F, 3, 3]
    for_f_r = jnp.einsum("kfab,kfa->fb", Af, rhs)                          # [F, 3]
    for i in range(F):
        c = 6 + 3 * i
        AtA = AtA.at[c:c + 3, 0:6].set(for_f_vg[i])
        AtA = AtA.at[0:6, c:c + 3].set(for_f_vg[i].T)
        AtA = AtA.at[c:c + 3, c:c + 3].set(for_f_ff[i])
        Atb = Atb.at[c:c + 3].set(for_f_r[i])

    # Regularize unobserved feature blocks so the factorization stays PSD.
    feat_rows = jnp.sum(obs_mask, axis=0)                            # [F]
    feat_ok = feat_rows >= 3
    reg = jnp.zeros((n_unk,), dtype)
    for i in range(F):
        reg = reg.at[6 + 3 * i:9 + 3 * i].set(jnp.where(feat_ok[i], 1e-9, 1.0))
    AtA = AtA + jnp.diag(reg + 1e-9)

    L = jnp.linalg.cholesky(AtA)
    sol = jax.scipy.linalg.cho_solve((L, True), Atb)
    solved = jnp.all(jnp.isfinite(sol))

    v0_I0 = sol[0:3]
    g_I0 = sol[3:6]
    p_f_I0 = sol[6:].reshape(F, 3)

    g_norm = jnp.linalg.norm(g_I0)
    g_err = jnp.abs(g_norm - opts.gravity_mag)
    ok = enough_rot & solved & (g_err < opts.max_gravity_err) & (jnp.sum(feat_ok) >= 5)

    # Global frame: gravity onto +z. A stationary/world-frame convention with
    # a_measured = R(g + a_w): here g_I0 is the gravity REACTION (the solved g
    # makes p̈ = v̇ − g...), so R_GtoI0 maps [0,0,g₀] to g_I0 direction.
    z_I = g_I0 / jnp.maximum(g_norm, 1e-9)
    e1 = jnp.asarray([1.0, 0.0, 0.0], dtype)
    x_I = e1 - z_I * (z_I @ e1)
    x_I = x_I / jnp.maximum(jnp.linalg.norm(x_I), 1e-9)
    y_I = jnp.cross(z_I, x_I)
    R_GtoI0 = jnp.stack([x_I, y_I, z_I], axis=1)
    q_GtoI0 = rot_2_quat(R_GtoI0)

    v0_G = R_GtoI0.T @ v0_I0
    p_f_G = jnp.einsum("ij,fj->fi", R_GtoI0.T, p_f_I0)
    return ok, q_GtoI0, v0_G, g_err, p_f_G, feat_ok


def _gravity_frame(g_I0, dtype):
    """Gram-Schmidt global frame with gravity on +z (yaw free)."""
    z_I = g_I0 / jnp.maximum(jnp.linalg.norm(g_I0), 1e-9)
    e1 = jnp.asarray([1.0, 0.0, 0.0], dtype)
    x_I = e1 - z_I * (z_I @ e1)
    x_I = x_I / jnp.maximum(jnp.linalg.norm(x_I), 1e-9)
    y_I = jnp.cross(z_I, x_I)
    return jnp.stack([x_I, y_I, z_I], axis=1)      # R_GtoI0


@functools.partial(jax.jit, static_argnames=("opts",))
def dynamic_mle_refine(imu_t, imu_w, imu_a, t_poses, uvn, obs_mask,
                       R_ItoC, p_IinC, v0_I0, g_I0, p_f_I0, feat_ok,
                       opts: DynInitOptions):
    """MLE refinement of the linear dynamic-init solution.

    The ov_init equivalent (DynamicInitializer fit_mle: a Ceres problem over
    window poses/velocities/biases/features with Factor_ImageReprojCalib and
    preintegration factors) re-designed as a SHOOTING problem: the window
    trajectory is a differentiable function of (v0, g, bg, ba) through the
    bias-corrected preintegration rollout, so the only residuals are

      * reprojection of every feature in every pose (whitened, masked),
      * a soft gravity-magnitude constraint,
      * zero-mean bias priors (bg, ba weakly observable in a short window).

    One LM solve over theta = [v0, g, bg, ba, p_f(3F)] (<= 60 params), with
    Jacobians by jacfwd through the scan rollout — exact, no hand-derived
    preintegration Jacobians. Returns (ok, q_GtoI0, v0_G, bg, ba, p_f_G,
    g_err, cost).
    """
    dtype = uvn.dtype
    P, F = uvn.shape[0], uvn.shape[1]
    w_uv = 1.0 / opts.mle_sigma_uv
    m = obs_mask.astype(dtype)

    def residuals(theta):
        v0, g = theta[0:3], theta[3:6]
        bg, ba = theta[6:9], theta[9:12]
        pf = theta[12:].reshape(F, 3)
        R_0k, alpha_k, _, dt_k = _preintegrate(imu_t, imu_w - bg, imu_a - ba, t_poses)
        # Camera centers in I0 (same composition as the linear rows).
        R_c = jnp.swapaxes(R_0k, 1, 2) @ R_ItoC.T               # R_CktoI0
        cam_off = -jnp.einsum("kij,j->ki", R_c, p_IinC)
        c_k = v0 * dt_k[:, None] - 0.5 * g * (dt_k**2)[:, None] + alpha_k + cam_off
        # Reprojection.
        R_I0toC = jnp.swapaxes(R_c, 1, 2)                       # [P,3,3]
        p_fC = jnp.einsum("kij,kfj->kfi", R_I0toC, pf[None] - c_k[:, None])
        z = jnp.where(jnp.abs(p_fC[..., 2]) < 1e-4, 1e-4, p_fC[..., 2])
        pred = p_fC[..., :2] / z[..., None]
        r_uv = ((uvn - pred) * m[..., None] * w_uv).reshape(2 * P * F)
        r_g = (jnp.linalg.norm(g) - opts.gravity_mag) / opts.mle_sigma_g
        r_b = jnp.concatenate([bg / opts.mle_sigma_bg, ba / opts.mle_sigma_ba])
        return jnp.concatenate([r_uv, r_g[None], r_b])

    theta0 = jnp.concatenate([
        v0_I0, g_I0, jnp.zeros(6, dtype),
        jnp.where(feat_ok[:, None], p_f_I0, 1.0).reshape(3 * F),
    ])
    n = theta0.shape[0]
    # Freeze invalid feature blocks (mask their update).
    free = jnp.concatenate([jnp.ones(12, bool),
                            jnp.repeat(feat_ok, 3)]).astype(dtype)

    def lm_step(carry, _):
        theta, lam = carry
        r = residuals(theta)
        J = jax.jacfwd(residuals)(theta) * free[None, :]
        H = J.T @ J
        gvec = -J.T @ r
        Hd = H + (lam * jnp.maximum(jnp.trace(H), 1e-6) / n
                  + 1e-9) * jnp.eye(n, dtype=dtype)
        L = jnp.linalg.cholesky(Hd)
        dx = jax.scipy.linalg.cho_solve((L, True), gvec) * free
        c_old = jnp.sum(r**2)
        c_new = jnp.sum(residuals(theta + dx) ** 2)
        better = (c_new < c_old) & jnp.all(jnp.isfinite(dx))
        theta = jnp.where(better, theta + dx, theta)
        lam = jnp.where(better, jnp.maximum(lam / 10.0, 1e-9), jnp.minimum(lam * 10.0, 1e6))
        return (theta, lam), c_new

    (theta, _), costs = jax.lax.scan(
        lm_step, (theta0, jnp.asarray(1e-4, dtype)), None, length=opts.mle_iters)

    v0, g = theta[0:3], theta[3:6]
    bg, ba = theta[6:9], theta[9:12]
    p_f = theta[12:].reshape(F, 3)
    g_err = jnp.abs(jnp.linalg.norm(g) - opts.gravity_mag)
    ok = jnp.all(jnp.isfinite(theta)) & (g_err < opts.max_gravity_err)

    R_GtoI0 = _gravity_frame(g, dtype)
    q_GtoI0 = rot_2_quat(R_GtoI0)
    v0_G = R_GtoI0.T @ v0
    p_f_G = jnp.einsum("ij,fj->fi", R_GtoI0.T, p_f)
    return ok, q_GtoI0, v0_G, bg, ba, p_f_G, g_err, costs[-1]
