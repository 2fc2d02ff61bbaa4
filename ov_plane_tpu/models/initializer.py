"""Inertial initialization.

Equivalent of the ov_init surface the reference depends on (SURVEY.md §2.3:
``InertialInitializer`` static + dynamic). Round 1 implements the *static*
initializer as a pure batched function: two consecutive IMU windows — the
older must be still (low accel variance), the newer must show a jerk
(variance above ``init_imu_thresh``) — then orientation is recovered from the
gravity direction of the still window via Gram-Schmidt, biases from the still
means, velocity zero. The dynamic (MLE) initializer is planned for a later
round; the entry point falls back to static.

All math is masked/fixed-shape; callers scan a ring buffer of IMU samples and
act on the returned `ok` flag.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.ops.quat import rot_2_quat


class InitOptions(NamedTuple):
    window_time: float = 2.0        # seconds per window (init_window_time)
    imu_thresh: float = 1.0         # accel stddev threshold for "excitation"
    gravity_mag: float = 9.81


@functools.partial(jax.jit, static_argnames=("opts",))
def static_initialize(imu_t, imu_w, imu_a, t_now, opts: InitOptions):
    """Try a static initialization from the IMU buffer.

    imu_t/w/a: [N] ring of recent samples (pad with +inf times). Window 2 =
    [t_now − w, t_now] must be excited; window 1 = [t_now − 2w, t_now − w]
    must be still; state is built from window 1 (ov_init StaticInitializer).

    Returns (ok, t0, imu16, cov_diag15):
      t0    — the init time (end of the still window),
      imu16 — [q_GtoI, p=0, v=0, bg, ba],
      cov_diag15 — diagonal prior for the IMU block.
    """
    dtype = imu_a.dtype
    w = opts.window_time
    in_w2 = (imu_t >= t_now - w) & (imu_t <= t_now) & jnp.isfinite(imu_t)
    in_w1 = (imu_t >= t_now - 2 * w) & (imu_t < t_now - w) & jnp.isfinite(imu_t)

    def masked_stats(x, m):
        n = jnp.maximum(jnp.sum(m), 1)
        mean = jnp.sum(x * m[:, None], axis=0) / n
        var = jnp.sum(((x - mean) ** 2) * m[:, None], axis=0) / jnp.maximum(n - 1, 1)
        return mean, var, n

    a1_mean, a1_var, n1 = masked_stats(imu_a, in_w1)
    _, a2_var, n2 = masked_stats(imu_a, in_w2)
    w1_mean, _, _ = masked_stats(imu_w, in_w1)

    a1_std = jnp.sqrt(jnp.sum(a1_var))
    a2_std = jnp.sqrt(jnp.sum(a2_var))
    ok = (n1 > 10) & (n2 > 10) & (a2_std > opts.imu_thresh) & (a1_std < opts.imu_thresh)

    # Gravity in the IMU frame ≈ mean accel of the still window.
    z_I = a1_mean / jnp.maximum(jnp.linalg.norm(a1_mean), 1e-9)
    # Gram-Schmidt basis (ov_init InitializerHelper::gram_schmidt).
    e1 = jnp.asarray([1.0, 0.0, 0.0], dtype)
    x_I = e1 - z_I * (z_I @ e1)
    x_I = x_I / jnp.maximum(jnp.linalg.norm(x_I), 1e-9)
    y_I = jnp.cross(z_I, x_I)
    # A stationary IMU measures a_m = R_GtoI·[0,0,g], so the third column of
    # R_GtoI must be z_I; (x_I, y_I, z_I) is a right-handed orthonormal basis
    # (yaw is unobservable — any x_I ⊥ z_I works).
    R_GtoI = jnp.stack([x_I, y_I, z_I], axis=1)
    q0 = rot_2_quat(R_GtoI)

    bg = w1_mean
    ba = a1_mean - R_GtoI @ jnp.asarray([0.0, 0.0, opts.gravity_mag], dtype)

    imu16 = jnp.concatenate([q0, jnp.zeros(3, dtype), jnp.zeros(3, dtype), bg, ba])
    cov_diag = jnp.concatenate([
        jnp.full(3, 0.02**2), jnp.full(3, 0.05**2), jnp.full(3, 0.01**2),
        jnp.full(3, 0.01**2), jnp.full(3, 0.05**2),
    ]).astype(dtype)
    t0 = jnp.asarray(t_now, dtype)
    return ok, t0, imu16, cov_diag
