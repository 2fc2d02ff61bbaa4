"""IMU state + covariance propagation and stochastic cloning.

TPU-native redesign of the reference ``Propagator`` (state/Propagator.cpp):

* ``select_imu_readings``'s dynamic list construction + boundary interpolation
  (Propagator.cpp:226-341) becomes a masked ``lax.scan`` over a fixed-size
  IMU window: each consecutive sample pair is clipped to the propagation
  interval, with linear interpolation of the boundary measurements; clipped
  intervals of zero length contribute identity Φ and zero Q.
* RK4 mean integration (predict_mean_rk4, Propagator.cpp:490-569) and the
  FEJ / standard analytic 15×15 Φ and G blocks (predict_and_compute,
  Propagator.cpp:343-454) are reproduced exactly, batched-friendly.
* cloning (StateHelper::augment_clone, StateHelper.cpp:588-625) writes the
  new pose into a recycled clone slot of the static layout.

The whole frame propagation is one jittable pure function of
(state, imu_window, t_new).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.ops import ekf
from ov_plane_tpu.ops.quat import exp_so3, jr_so3, omega, quat_2_rot, quat_multiply, quat_norm, skew
from ov_plane_tpu.state.vio_state import VioState


class PropagatorOptions(NamedTuple):
    """Static flags (hashable, safe to close over under jit)."""

    use_rk4: bool = True
    imu_avg: bool = True
    do_fej: bool = True
    do_calib_camera_timeoffset: bool = False


def predict_mean_rk4(imu, dt, w1, a1, w2, a2, gravity):
    """RK4 integration of (q, p, v) over one interval (Propagator.cpp:490-569)."""
    q_0, p_0, v_0 = imu[0:4], imu[4:7], imu[7:10]
    w_alpha = (w2 - w1) / dt
    a_jerk = (a2 - a1) / dt

    def qdot(dq, w):
        return 0.5 * omega(w) @ dq

    def vdot(dq, a):
        return quat_2_rot(quat_multiply(dq, q_0)).T @ a - gravity

    dq_0 = jnp.array([0.0, 0.0, 0.0, 1.0], imu.dtype)
    # k1
    w_hat, a_hat = w1, a1
    k1_q = qdot(dq_0, w_hat) * dt
    k1_p = v_0 * dt
    k1_v = vdot(dq_0, a_hat) * dt
    # k2
    w_hat = w1 + 0.5 * w_alpha * dt
    a_hat = a1 + 0.5 * a_jerk * dt
    dq_1 = quat_norm(dq_0 + 0.5 * k1_q)
    v_1 = v_0 + 0.5 * k1_v
    k2_q = qdot(dq_1, w_hat) * dt
    k2_p = v_1 * dt
    k2_v = vdot(dq_1, a_hat) * dt
    # k3
    dq_2 = quat_norm(dq_0 + 0.5 * k2_q)
    v_2 = v_0 + 0.5 * k2_v
    k3_q = qdot(dq_2, w_hat) * dt
    k3_p = v_2 * dt
    k3_v = vdot(dq_2, a_hat) * dt
    # k4
    w_hat = w1 + w_alpha * dt
    a_hat = a1 + a_jerk * dt
    dq_3 = quat_norm(dq_0 + k3_q)
    v_3 = v_0 + k3_v
    k4_q = qdot(dq_3, w_hat) * dt
    k4_p = v_3 * dt
    k4_v = vdot(dq_3, a_hat) * dt

    dq = quat_norm(dq_0 + (k1_q + 2 * k2_q + 2 * k3_q + k4_q) / 6.0)
    new_q = quat_multiply(dq, q_0)
    new_p = p_0 + (k1_p + 2 * k2_p + 2 * k3_p + k4_p) / 6.0
    new_v = v_0 + (k1_v + 2 * k2_v + 2 * k3_v + k4_v) / 6.0
    return new_q, new_p, new_v


def predict_mean_discrete(imu, dt, w1, a1, w2, a2, gravity, imu_avg: bool):
    """Constant-measurement discrete integration (Propagator.cpp:456-488)."""
    q_0, p_0, v_0 = imu[0:4], imu[4:7], imu[7:10]
    w_hat = 0.5 * (w1 + w2) if imu_avg else w1
    a_hat = 0.5 * (a1 + a2) if imu_avg else a1
    w_norm = jnp.linalg.norm(w_hat)
    I4 = jnp.eye(4, dtype=imu.dtype)
    big_o = jnp.where(
        w_norm > 1e-20,
        jnp.cos(0.5 * w_norm * dt) * I4
        + jnp.sin(0.5 * w_norm * dt) / jnp.where(w_norm > 1e-20, w_norm, 1.0) * omega(w_hat),
        I4 + 0.5 * dt * omega(w_hat),
    )
    new_q = quat_norm(big_o @ q_0)
    R_Gtoi = quat_2_rot(q_0)
    new_v = v_0 + R_Gtoi.T @ a_hat * dt - gravity * dt
    new_p = p_0 + v_0 * dt + 0.5 * R_Gtoi.T @ a_hat * dt * dt - 0.5 * gravity * dt * dt
    return new_q, new_p, new_v


def _phi_g_blocks(imu, imu_fej, new_q, new_p, new_v, dt, w_hat, a_hat, gravity, do_fej: bool):
    """Analytic 15×15 state-transition Φ and 15×12 noise Jacobian G
    (Propagator.cpp:375-432). Block order: [δθ, δp, δv, δbg, δba]."""
    dtype = imu.dtype
    I3 = jnp.eye(3, dtype=dtype)
    F = jnp.zeros((15, 15), dtype)
    G = jnp.zeros((15, 12), dtype)

    if do_fej:
        Rfej = quat_2_rot(imu_fej[0:4])
        v_fej = imu_fej[7:10]
        p_fej = imu_fej[4:7]
        dR = quat_2_rot(new_q) @ Rfej.T
        th_bg = -dR @ jr_so3(-w_hat * dt) * dt
        F = F.at[0:3, 0:3].set(dR)
        F = F.at[0:3, 9:12].set(th_bg)
        F = F.at[6:9, 0:3].set(-skew(new_v - v_fej + gravity * dt) @ Rfej.T)
        F = F.at[6:9, 12:15].set(-Rfej.T * dt)
        F = F.at[3:6, 0:3].set(-skew(new_p - p_fej - v_fej * dt + 0.5 * gravity * dt * dt) @ Rfej.T)
        F = F.at[3:6, 12:15].set(-0.5 * Rfej.T * dt * dt)
        G = G.at[0:3, 0:3].set(th_bg)
        G = G.at[6:9, 3:6].set(-Rfej.T * dt)
        G = G.at[3:6, 3:6].set(-0.5 * Rfej.T * dt * dt)
    else:
        R_Gtoi = quat_2_rot(imu[0:4])
        e = exp_so3(-w_hat * dt)
        th_bg = -e @ jr_so3(-w_hat * dt) * dt
        F = F.at[0:3, 0:3].set(e)
        F = F.at[0:3, 9:12].set(th_bg)
        F = F.at[6:9, 0:3].set(-R_Gtoi.T @ skew(a_hat * dt))
        F = F.at[6:9, 12:15].set(-R_Gtoi.T * dt)
        F = F.at[3:6, 0:3].set(-0.5 * R_Gtoi.T @ skew(a_hat * dt * dt))
        F = F.at[3:6, 12:15].set(-0.5 * R_Gtoi.T * dt * dt)
        G = G.at[0:3, 0:3].set(th_bg)
        G = G.at[6:9, 3:6].set(-R_Gtoi.T * dt)
        G = G.at[3:6, 3:6].set(-0.5 * R_Gtoi.T * dt * dt)

    F = F.at[3:6, 3:6].set(I3)
    F = F.at[3:6, 6:9].set(I3 * dt)
    F = F.at[6:9, 6:9].set(I3)
    F = F.at[9:12, 9:12].set(I3)
    F = F.at[12:15, 12:15].set(I3)
    G = G.at[9:12, 6:9].set(I3)
    G = G.at[12:15, 9:12].set(I3)
    return F, G


def predict_and_compute(imu, imu_fej, dt, w1, a1, w2, a2, noises, gravity, opts: PropagatorOptions):
    """One-interval mean + (Φ, Qd) (Propagator.cpp:343-454).

    noises = [σ_w², σ_a², σ_wb², σ_ab²] continuous-time.
    Returns (new_imu16, Φ[15,15], Qd[15,15]).
    """
    bg, ba = imu[10:13], imu[13:16]
    w_hat, a_hat = w1 - bg, a1 - ba
    w_hat2, a_hat2 = w2 - bg, a2 - ba

    if opts.use_rk4:
        new_q, new_p, new_v = predict_mean_rk4(imu, dt, w_hat, a_hat, w_hat2, a_hat2, gravity)
    else:
        new_q, new_p, new_v = predict_mean_discrete(imu, dt, w_hat, a_hat, w_hat2, a_hat2, gravity, opts.imu_avg)

    F, G = _phi_g_blocks(imu, imu_fej, new_q, new_p, new_v, dt, w_hat, a_hat, gravity, opts.do_fej)

    # Discrete noise: Qd = G Qc Gᵀ, Qc = diag(σ_w²/dt, σ_a²/dt, σ_wb²·dt, σ_ab²·dt)
    # (Trawny eq. 129-130; Propagator.cpp:434-445).
    dt_safe = jnp.where(dt > 0, dt, 1.0)
    qc_diag = jnp.concatenate(
        [
            jnp.full(3, noises[0] / dt_safe),
            jnp.full(3, noises[1] / dt_safe),
            jnp.full(3, noises[2] * dt_safe),
            jnp.full(3, noises[3] * dt_safe),
        ]
    ).astype(imu.dtype)
    Qd = G @ (qc_diag[:, None] * G.T)
    Qd = 0.5 * (Qd + Qd.T)

    new_imu = jnp.concatenate([new_q, new_p, new_v, bg, ba])
    return new_imu, F, Qd


@functools.partial(jax.jit, static_argnames=("opts",))
def propagate_mean_cov(imu, imu_fej, imu_t, imu_w, imu_a, t0, t1,
                       noises, gravity, opts: PropagatorOptions):
    """Scan consecutive IMU sample pairs over [t0, t1]; returns
    (imu_new, imu_fej_new, Φ_total, Qd_total, last_w_hat).

    Interval clipping + boundary lerp reproduces select_imu_readings
    (Propagator.cpp:226-341). Padding entries (t = +inf or non-increasing)
    yield zero-length clipped intervals and are no-ops.
    """
    dtype = imu.dtype
    eye15 = jnp.eye(15, dtype=dtype)

    t_a_raw = imu_t[:-1]
    t_b_raw = imu_t[1:]

    def lerp(t, ta, tb, va, vb):
        lam = jnp.where(tb > ta, (t - ta) / jnp.where(tb > ta, tb - ta, 1.0), 0.0)
        return (1 - lam) * va + lam * vb

    def body(carry, xs):
        imu_c, fej_c, phi, qd, last_w = carry
        ta_r, tb_r, wa_r, aa_r, wb_r, ab_r = xs
        ta = jnp.clip(ta_r, t0, t1)
        tb = jnp.clip(tb_r, t0, t1)
        dt = tb - ta
        valid = (dt > 0) & jnp.isfinite(dt)
        dt_s = jnp.where(valid, dt, 1.0)
        w1 = lerp(ta, ta_r, tb_r, wa_r, wb_r)
        a1 = lerp(ta, ta_r, tb_r, aa_r, ab_r)
        w2 = lerp(tb, ta_r, tb_r, wa_r, wb_r)
        a2 = lerp(tb, ta_r, tb_r, aa_r, ab_r)
        new_imu, F, Qd_s = predict_and_compute(imu_c, fej_c, dt_s, w1, a1, w2, a2, noises, gravity, opts)
        imu_n = jnp.where(valid, new_imu, imu_c)
        fej_n = jnp.where(valid, new_imu, fej_c)
        phi_n = jnp.where(valid, F @ phi, phi)
        qd_n = jnp.where(valid, F @ qd @ F.T + Qd_s, qd)
        last_w_n = jnp.where(valid, w2 - imu_c[10:13], last_w)
        return (imu_n, fej_n, phi_n, qd_n, last_w_n), None

    xs = (t_a_raw, t_b_raw, imu_w[:-1], imu_a[:-1], imu_w[1:], imu_a[1:])
    init = (imu, imu_fej, eye15, jnp.zeros((15, 15), dtype), jnp.zeros(3, dtype))
    (imu_n, fej_n, phi, qd, last_w), _ = jax.lax.scan(body, init, xs)
    return imu_n, fej_n, phi, qd, last_w


@functools.partial(jax.jit, static_argnames=("opts",))
def propagate_and_clone(state: VioState, imu_t, imu_w, imu_a, t_new,
                        noises, gravity, opts: PropagatorOptions):
    """Full frame propagation + stochastic cloning (Propagator::propagate_and_clone,
    Propagator.cpp:37-126 + StateHelper::augment_clone).

    imu_t/w/a: fixed-size window of IMU samples covering [state.t, t_new]
    (pad before/after; padding is ignored by interval clipping).
    Returns the new VioState with the clone inserted in a recycled slot.
    """
    lay = state.layout
    # Camera-clock → IMU-clock mapping (Propagator.cpp:60-78): the interval is
    # [state.t + last_dt, t_new + calib_dt_estimate].
    t0_imu = state.t + state.last_dt
    t1_imu = jnp.asarray(t_new, state.t.dtype) + state.calib_dt
    imu_n, fej_n, phi, qd, last_w = propagate_mean_cov(
        state.imu, state.imu_fej, imu_t, imu_w, imu_a, t0_imu, t1_imu, noises, gravity, opts
    )
    cov = ekf.propagate_cov(state.cov, phi, qd)

    # --- clone into a recycled slot -------------------------------------
    # Free slots have t = -inf; otherwise we must have marginalized already
    # (the manager guarantees < max_clones active here).
    slot = jnp.argmin(state.clones_t)
    slot_col = lay.clone_base + 6 * slot
    cov = ekf.zero_slot(cov, slot_col, 6)
    cov = ekf.clone_block(cov, 0, slot_col, 6)  # IMU pose error = rows 0:6 (δθ, δp)
    if opts.do_calib_camera_timeoffset:
        dnc_dt = jnp.concatenate([last_w, imu_n[7:10]])
        cov = ekf.augment_clone_timeoffset(cov, slot_col, dnc_dt, lay.dt_idx)

    state = state.replace(
        t=jnp.asarray(t_new, state.t.dtype),
        last_dt=state.calib_dt,
        imu=imu_n,
        imu_fej=fej_n,
        cov=cov,
        clones_q=state.clones_q.at[slot].set(imu_n[0:4]),
        clones_p=state.clones_p.at[slot].set(imu_n[4:7]),
        clones_q_fej=state.clones_q_fej.at[slot].set(fej_n[0:4]),
        clones_p_fej=state.clones_p_fej.at[slot].set(fej_n[4:7]),
        clones_t=state.clones_t.at[slot].set(t_new),
    )
    return state, slot


@functools.partial(jax.jit, static_argnames=("opts",))
def fast_state_propagate(state: VioState, imu_t, imu_w, imu_a, t_target,
                         noises, gravity, opts: PropagatorOptions):
    """High-rate odometry output (Propagator::fast_state_propagate,
    Propagator.cpp:128-224): propagate a COPY of the mean (and the 15×15 IMU
    covariance block) to `t_target` without mutating the filter state.

    Returns (imu16, cov15) — pose/velocity for publishing between updates.
    """
    imu_n, _, phi, qd, _ = propagate_mean_cov(
        state.imu, state.imu_fej, imu_t, imu_w, imu_a,
        state.t + state.last_dt, jnp.asarray(t_target, state.t.dtype) + state.calib_dt,
        noises, gravity, opts,
    )
    cov15 = phi @ state.cov[:15, :15] @ phi.T + qd
    return imu_n, 0.5 * (cov15 + cov15.T)


@functools.partial(jax.jit, static_argnames=("max_clone_size",))
def marginalize_oldest_clone(state: VioState, max_clone_size: int) -> VioState:
    """Drop the oldest clone if over budget (StateHelper::marginalize_old_clone,
    StateHelper.cpp:627-636). Static-shape: zero the slot + mark free."""
    lay = state.layout
    slot = state.oldest_clone_slot
    over = state.num_clones > max_clone_size
    cov = jnp.where(over, ekf.zero_slot(state.cov, lay.clone_base + 6 * slot, 6), state.cov)
    clones_t = jnp.where(over, state.clones_t.at[slot].set(-jnp.inf), state.clones_t)
    return state.replace(cov=cov, clones_t=clones_t)


@jax.jit
def marginalize_clone_slot(state: VioState, slot) -> VioState:
    """Unconditionally marginalize one clone slot (zero rows/cols + free)."""
    lay = state.layout
    cov = ekf.zero_slot(state.cov, lay.clone_base + 6 * slot, 6)
    return state.replace(cov=cov, clones_t=state.clones_t.at[slot].set(-jnp.inf))
