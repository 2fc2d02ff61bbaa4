"""Zero-velocity update (ZUPT).

Re-design of ``UpdaterZeroVelocity::try_update``
(update/UpdaterZeroVelocity.cpp:68-318), standard (non-integrated,
non-explicit) formulation: pseudo-measurements ω = 0, a = R·g over the
frame's IMU window, per-sample whitened rows, bias random-walk inflation,
chi2 + velocity-magnitude + image-disparity gating. If the ZUPT is accepted,
the caller SKIPS propagation/cloning for the frame (the state time simply
advances), matching the reference control flow (VioManager.cpp:305-313).

Everything is masked/fixed-shape: the decision comes back as a boolean the
frame step uses to select between the ZUPT branch and the normal branch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.ops import ekf
from ov_plane_tpu.ops.quat import quat_2_rot, skew
from ov_plane_tpu.state.vio_state import VioState
from ov_plane_tpu.utils.chi2 import CHI2_095_TABLE


class ZuptOptions(NamedTuple):
    chi2_multipler: float = 1.0
    noise_multiplier: float = 50.0
    max_velocity: float = 0.1
    max_disparity: float = 0.5
    only_at_beginning: bool = True
    sigma_w2: float = 1.6968e-04**2
    sigma_a2: float = 2.0e-3**2
    sigma_wb2: float = 1.9393e-05**2
    sigma_ab2: float = 3.0e-03**2
    do_fej: bool = True
    gravity_mag: float = 9.81
    # Variant toggles (UpdaterZeroVelocity.cpp:113-117):
    # integrated_accel: replace the direct a=Rg rows with the velocity
    # integral v − g·dt + Rᵀ·â·dt = 0 (adds velocity columns).
    integrated_accel: bool = False
    # explicit_zero_motion: propagate+clone then constrain the relative
    # (ori, pos) between the two clones and v to zero (:252-313); the frame
    # step marginalizes the transient clone.
    explicit_zero_motion: bool = False


@functools.partial(jax.jit, static_argnames=("opts",))
def try_zupt(state: VioState, opts: ZuptOptions, imu_t, imu_w, imu_a, t_new,
             avg_disparity, n_disp_features):
    """Attempt a zero-velocity update over [state.t, t_new].

    imu_t/w/a: the frame's IMU window (padded). Returns
    (zupt_state, accepted): `zupt_state` is the state after the ZUPT with time
    advanced; the caller selects it when `accepted`.
    """
    lay = state.layout
    D = lay.dim
    dtype = state.imu.dtype
    I = imu_t.shape[0]
    table = jnp.asarray(CHI2_095_TABLE, dtype)

    bg, ba = state.imu[10:13], state.imu[13:16]
    R_GtoI = quat_2_rot(state.imu[0:4])
    R_jac = quat_2_rot(state.imu_fej[0:4]) if opts.do_fej else R_GtoI
    gravity = jnp.asarray([0.0, 0.0, opts.gravity_mag], dtype)

    # Camera-clock → IMU-clock interval (UpdaterZeroVelocity.cpp:91-100).
    t0_imu = state.t + state.last_dt
    t1_imu = jnp.asarray(t_new, dtype) + state.calib_dt
    ta = jnp.clip(imu_t[:-1], t0_imu, t1_imu)
    tb = jnp.clip(imu_t[1:], t0_imu, t1_imu)
    dt = tb - ta
    valid = (dt > 0) & jnp.isfinite(dt)
    dt_s = jnp.where(valid, dt, 1.0)

    # Residuals per interval: r_w = −(w_m − bg) always; accel rows depend on
    # the formulation (UpdaterZeroVelocity.cpp:148-177).
    r_w = -(imu_w[:-1] - bg) * valid[:, None]
    a_hat = imu_a[:-1] - ba
    if opts.integrated_accel:
        # v_{k+1}=0 integral: r = −(v − g·dt + Rᵀ â dt); noise σ_a²·dt.
        v = state.imu[7:10]
        r_a = -(v[None, :] - gravity[None, :] * dt_s[:, None]
                + (a_hat @ R_GtoI) * dt_s[:, None]) * valid[:, None]
        s_a = jnp.sqrt(opts.sigma_a2 * dt_s * opts.noise_multiplier)
    else:
        r_a = -(a_hat - (R_GtoI @ gravity)) * valid[:, None]
        s_a = jnp.sqrt(opts.sigma_a2 / dt_s * opts.noise_multiplier)

    # Whiten by per-row noise: σ_w²/dt (gyro), accel per above, × multiplier.
    s_w = jnp.sqrt(opts.sigma_w2 / dt_s * opts.noise_multiplier)
    r_w_wh = r_w / s_w[:, None]
    r_a_wh = r_a / s_a[:, None]

    # Full-width whitened Jacobians (H rows: gyro then accel per interval).
    # Gyro row: ∂/∂bg = −I.
    Hg = jnp.zeros((I - 1, 3, D), dtype)
    Hg = Hg.at[:, :, lay.IMU_BG:lay.IMU_BG + 3].set(-jnp.eye(3, dtype=dtype)[None])
    Hg = Hg / s_w[:, None, None] * valid[:, None, None]
    Ha = jnp.zeros((I - 1, 3, D), dtype)
    if opts.integrated_accel:
        # ∂/∂θ = −R_jacᵀ⌊â⌋dt, ∂/∂ba = −R_jacᵀdt, ∂/∂v = I (:159-167).
        Ha = Ha.at[:, :, lay.IMU_TH:lay.IMU_TH + 3].set(
            -jnp.einsum("ab,kbc->kac", R_jac.T, jax.vmap(skew)(a_hat)) * dt_s[:, None, None])
        Ha = Ha.at[:, :, lay.IMU_BA:lay.IMU_BA + 3].set(
            (-R_jac.T)[None] * dt_s[:, None, None])
        Ha = Ha.at[:, :, lay.IMU_V:lay.IMU_V + 3].set(jnp.eye(3, dtype=dtype)[None])
    else:
        # ∂/∂θ = −⌊R_jac·g⌋, ∂/∂ba = −I.
        Ha = Ha.at[:, :, lay.IMU_TH:lay.IMU_TH + 3].set(-skew(R_jac @ gravity)[None])
        Ha = Ha.at[:, :, lay.IMU_BA:lay.IMU_BA + 3].set(-jnp.eye(3, dtype=dtype)[None])
    Ha = Ha / s_a[:, None, None] * valid[:, None, None]

    H = jnp.concatenate([Hg, Ha], axis=1).reshape((I - 1) * 6, D)
    res = jnp.concatenate([r_w_wh, r_a_wh], axis=1).reshape((I - 1) * 6)

    # Bias random-walk inflation over the window (Q_bias, :183-193) — applied
    # to a covariance copy for gating, and propagated into the state on accept.
    dt_sum = jnp.sum(jnp.where(valid, dt, 0.0))
    q_bias = jnp.zeros((D,), dtype)
    q_bias = q_bias.at[lay.IMU_BG:lay.IMU_BG + 3].set(dt_sum * jnp.sqrt(opts.sigma_wb2))
    q_bias = q_bias.at[lay.IMU_BA:lay.IMU_BA + 3].set(dt_sum * jnp.sqrt(opts.sigma_ab2))
    cov_gate = state.cov + jnp.diag(q_bias)

    chi2 = ekf.innovation_chi2(cov_gate, H, res, jnp.ones_like(res))
    n_rows = 6 * jnp.sum(valid)
    chi2_ok = chi2 <= opts.chi2_multipler * table[jnp.clip(n_rows, 1, table.shape[0] - 1)]
    vel_ok = jnp.linalg.norm(state.imu[7:10]) <= opts.max_velocity
    disparity_ok = (avg_disparity < opts.max_disparity) & (n_disp_features > 20)
    accepted = disparity_ok | (chi2_ok & vel_ok)

    # Apply: inflate bias covariance, EKF update, advance time (no clone).
    new_cov = state.cov + jnp.diag(q_bias)
    zupt_state, _ = ekf.ekf_update(state.replace(cov=new_cov), H, res, jnp.ones_like(res))
    zupt_state = zupt_state.replace(t=jnp.asarray(t_new, dtype), last_dt=state.calib_dt)
    return zupt_state, accepted


@functools.partial(jax.jit, static_argnames=("opts",))
def zupt_explicit_update(state: VioState, opts: ZuptOptions, slot0, slot1):
    """Explicit zero-motion formulation (UpdaterZeroVelocity.cpp:252-313):
    after the caller has propagated AND cloned to the new time (clone slot1),
    constrain the relative orientation/position between clone slot0 (previous
    time) and slot1 to zero, and the velocity to zero, with fixed noise
    (1e-2, 1e-1, 1e-1); then marginalize the transient clone slot1.

    Returns the updated state (slot1 freed).
    """
    from ov_plane_tpu.ops.quat import log_so3
    from ov_plane_tpu.state.propagator import marginalize_clone_slot

    lay = state.layout
    D = lay.dim
    dtype = state.imu.dtype

    R0 = quat_2_rot(state.clones_q[slot0])
    R1 = quat_2_rot(state.clones_q[slot1])
    p0 = state.clones_p[slot0]
    p1 = state.clones_p[slot1]
    R0_jac = quat_2_rot(state.clones_q_fej[slot0]) if opts.do_fej else R0

    # Residuals, sign-flipped as in the reference (res *= -1, :285).
    res = jnp.concatenate([
        log_so3(R0 @ R1.T),
        -(p1 - p0),
        -state.imu[7:10],
    ])

    # Whitened rows: ori sigma 1e-2, pos/vel sigma 1e-1 (:305-308).
    sig = jnp.concatenate([jnp.full((3,), 1e-2, dtype), jnp.full((6,), 1e-1, dtype)])
    H = jnp.zeros((9, D), dtype)
    I3 = jnp.eye(3, dtype=dtype)
    z = jnp.zeros((), slot0.dtype) if hasattr(slot0, "dtype") else 0
    c0 = lay.clone_base + 6 * slot0
    c1 = lay.clone_base + 6 * slot1
    # ori rows: ∂/∂θ0 = I, ∂/∂θ1 = −R0_jac (:296-300).
    H = jax.lax.dynamic_update_slice(H, I3, (0, c0))
    H = jax.lax.dynamic_update_slice(H, -R0_jac, (0, c1))
    # pos rows: ∂/∂p0 = −I, ∂/∂p1 = I.
    H = jax.lax.dynamic_update_slice(H, -I3, (3, c0 + 3))
    H = jax.lax.dynamic_update_slice(H, I3, (3, c1 + 3))
    # vel rows.
    H = H.at[6:9, lay.IMU_V:lay.IMU_V + 3].set(I3)
    H = H / sig[:, None]
    res = res / sig

    new_state, _ = ekf.ekf_update(state, H, res, jnp.ones_like(res))
    # Remove the transient clone (StateHelper::marginalize + erase, :311-312).
    return marginalize_clone_slot(new_state, slot1)


def compute_disparity(bank_uv, bank_mask, prev_slot, cur_slot):
    """Average pixel disparity between two clone slots over shared tracks
    (ov_core FeatureHelper::compute_disparity equivalent)."""
    both = bank_mask[:, prev_slot] & bank_mask[:, cur_slot]
    d = jnp.linalg.norm(bank_uv[:, cur_slot] - bank_uv[:, prev_slot], axis=1)
    n = jnp.sum(both)
    avg = jnp.sum(jnp.where(both, d, 0.0)) / jnp.maximum(n, 1)
    return avg, n
