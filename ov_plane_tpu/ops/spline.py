"""Cumulative cubic B-spline on SE(3), with autodiff kinematics.

Equivalent of ov_core's ``BsplineSE3`` (used by the reference Simulator,
Simulator.cpp:78-88,340 — SURVEY.md §2.3), redesigned for JAX:

* control poses are fixed arrays; pose lookup is a dynamic-slice + four
  matrix exponentials (standard cumulative form, Patron-Perez/Mueggler);
* velocity and acceleration (the reference's hand-derived ``get_velocity`` /
  ``get_acceleration`` matrix chains) are obtained with nested ``jax.jvp``
  over time — exact, and trivially correct;
* everything is jit/vmap-safe, so the simulator can sample whole IMU/camera
  timelines in one batched call.

Conventions: control/queried rotations are R_GtoI (JPL direction), positions
p_IinG. Internally the spline blends T_ItoG = [R_GtoIᵀ, p; 0, 1].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.ops.quat import exp_so3, log_so3, quat_2_rot, skew


class SplineSE3(NamedTuple):
    """Uniform cumulative B-spline: control transforms T_ItoG at times t0 + i·dt."""

    t0: jnp.ndarray        # scalar: time of control point 0
    dt: jnp.ndarray        # scalar: uniform control spacing
    ctrl_R: jnp.ndarray    # [N, 3, 3] R_ItoG control rotations
    ctrl_p: jnp.ndarray    # [N, 3] p_IinG control positions
    omegas: jnp.ndarray    # [N-1, 6] log(T_i⁻¹ T_{i+1}) (w, v) precomputed

    @property
    def start_time(self):
        """First valid query time (need control points i-1..i+2)."""
        return self.t0 + self.dt

    @property
    def end_time(self):
        n = self.ctrl_R.shape[0]
        return self.t0 + (n - 2) * self.dt


def _se3_log(R, p):
    """log of T = [R, p; 0, 1] -> (w, v) with v = Jl(w)^{-1} p."""
    w = log_so3(R)
    theta = jnp.linalg.norm(w)
    W = skew(w)
    small = theta < 1e-7
    theta_s = jnp.where(small, 1.0, theta)
    # Jl^{-1} = I - 1/2 W + (1/θ² - (1+cosθ)/(2θ sinθ)) W²
    coef = jnp.where(
        small,
        1.0 / 12.0,
        1.0 / theta_s**2 - (1.0 + jnp.cos(theta_s)) / (2.0 * theta_s * jnp.sin(theta_s)),
    )
    Jl_inv = jnp.eye(3, dtype=R.dtype) - 0.5 * W + coef * (W @ W)
    return jnp.concatenate([w, Jl_inv @ p])


def _se3_exp(wv):
    """exp of (w, v) -> (R, p) with p = Jl(w) v.

    jvp-safe at w = 0 (exactly-zero twists arise from duplicate control
    poses, e.g. a hovering segment): θ² is computed as Σw² and the sqrt is
    taken of a where-guarded value, because norm(w) has a NaN derivative at
    the origin that leaks through the Taylor branch's tangent."""
    w, v = wv[0:3], wv[3:6]
    R = exp_so3(w)
    theta2 = w @ w
    W = skew(w)
    small = theta2 < 1e-14
    theta2_s = jnp.where(small, 1.0, theta2)
    theta_s = jnp.sqrt(theta2_s)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta_s)) / theta2_s)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta_s - jnp.sin(theta_s)) / (theta2_s * theta_s))
    Jl = jnp.eye(3, dtype=wv.dtype) + B * W + C * (W @ W)
    return R, Jl @ v


def fit_spline(times, quats_GtoI, positions):
    """Build a uniform spline from (possibly non-uniform) trajectory samples.

    Mirrors BsplineSE3::feed_trajectory: dt = average spacing; control points
    are the trajectory resampled at uniform dt (linear position / nearest-pose
    orientation interpolation via log-lerp).
    """
    times = jnp.asarray(times)
    n = times.shape[0]
    dt = (times[-1] - times[0]) / (n - 1)
    t_ctrl = times[0] + dt * jnp.arange(n)

    R_GtoI = jax.vmap(quat_2_rot)(jnp.asarray(quats_GtoI))
    R_ItoG = jnp.swapaxes(R_GtoI, -1, -2)
    p = jnp.asarray(positions)

    # Resample at uniform t_ctrl by interpolation between bounding input samples.
    idx = jnp.clip(jnp.searchsorted(times, t_ctrl, side="right") - 1, 0, n - 2)
    t_a, t_b = times[idx], times[idx + 1]
    lam = jnp.where(t_b > t_a, (t_ctrl - t_a) / jnp.where(t_b > t_a, t_b - t_a, 1.0), 0.0)
    lam = jnp.clip(lam, 0.0, 1.0)
    p_ctrl = (1 - lam[:, None]) * p[idx] + lam[:, None] * p[idx + 1]

    def interp_R(Ra, Rb, l):
        return Ra @ exp_so3(l * log_so3(jnp.swapaxes(Ra, -1, -2) @ Rb))

    R_ctrl = jax.vmap(interp_R)(R_ItoG[idx], R_ItoG[idx + 1], lam)

    def rel_log(Ra, pa, Rb, pb):
        return _se3_log(jnp.swapaxes(Ra, -1, -2) @ Rb, jnp.swapaxes(Ra, -1, -2) @ (pb - pa))

    omegas = jax.vmap(rel_log)(R_ctrl[:-1], p_ctrl[:-1], R_ctrl[1:], p_ctrl[1:])
    return SplineSE3(t0=times[0], dt=dt, ctrl_R=R_ctrl, ctrl_p=p_ctrl, omegas=omegas)


def pose(spline: SplineSE3, t):
    """Query T_ItoG(t) -> (R_GtoI, p_IinG). Cumulative cubic blending."""
    n = spline.ctrl_R.shape[0]
    fi = (t - spline.t0) / spline.dt
    i = jnp.clip(jnp.floor(fi).astype(jnp.int32), 1, n - 3)
    u = (fi - i.astype(fi.dtype))

    b1 = (5.0 + 3.0 * u - 3.0 * u**2 + u**3) / 6.0
    b2 = (1.0 + 3.0 * u + 3.0 * u**2 - 2.0 * u**3) / 6.0
    b3 = (u**3) / 6.0

    z = jnp.zeros((), i.dtype)
    R0 = jax.lax.dynamic_slice(spline.ctrl_R, (i - 1, z, z), (1, 3, 3))[0]
    p0 = jax.lax.dynamic_slice(spline.ctrl_p, (i - 1, z), (1, 3))[0]
    om = jax.lax.dynamic_slice(spline.omegas, (i - 1, z), (3, 6))

    RA, pA = _se3_exp(b1 * om[0])
    RB, pB = _se3_exp(b2 * om[1])
    RC, pC = _se3_exp(b3 * om[2])

    # T = T0 * A * B * C (compose rotations/translations explicitly).
    R01 = R0 @ RA
    p01 = p0 + R0 @ pA
    R012 = R01 @ RB
    p012 = p01 + R01 @ pB
    R_ItoG = R012 @ RC
    p_IinG = p012 + R012 @ pC
    return jnp.swapaxes(R_ItoG, -1, -2), p_IinG  # (R_GtoI, p)


def velocity(spline: SplineSE3, t):
    """(R_GtoI, p, w_IinI, v_IinG) via one jvp over t (BsplineSE3::get_velocity)."""
    def f(tt):
        R_GtoI, p = pose(spline, tt)
        return R_GtoI, p

    (R_GtoI, p), (dR, dp) = jax.jvp(f, (t,), (jnp.ones_like(t),))
    # R_ItoG = R_GtoIᵀ; Ṙ_ItoG = R_ItoG ⌊w_body⌋ → ⌊w⌋ = R_GtoI Ṙ_ItoG.
    Wb = R_GtoI @ jnp.swapaxes(dR, -1, -2)
    w_IinI = jnp.stack([Wb[2, 1], Wb[0, 2], Wb[1, 0]])
    return R_GtoI, p, w_IinI, dp


def acceleration(spline: SplineSE3, t):
    """(R_GtoI, p, w_IinI, v, alpha_IinI, a_IinG) via nested jvp
    (BsplineSE3::get_acceleration)."""
    def f(tt):
        return velocity(spline, tt)

    (R_GtoI, p, w, v), (_, _, dw, dv) = jax.jvp(f, (t,), (jnp.ones_like(t),))
    return R_GtoI, p, w, v, dw, dv
