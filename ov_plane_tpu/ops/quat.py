"""JPL quaternion and SO(3) operations.

Provides the math substrate the estimator is built on (the reference relies on
ov_core's ``utils/quat_ops.h`` for the same surface; see SURVEY.md §2.3).

Conventions (Trawny & Roumeliotis, "Indirect Kalman Filter for 3D Attitude
Estimation", tech report 2005 — same as the reference):

* Quaternions are JPL: ``q = [x, y, z, w]`` with the scalar LAST.
* ``q`` represents the *global-to-local* rotation: ``R(q) = R_GtoL``.
* ``quat_multiply(q, p)`` satisfies ``R(q ⊗ p) = R(q) R(p)``.
* All functions are shape-polymorphic over leading batch dimensions and are
  safe under ``jit``/``vmap``/``grad`` (no data-dependent branching; small-angle
  limits handled via Taylor-switched ``jnp.where`` with NaN-safe operands).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def skew(v):
    """Skew-symmetric matrix ⌊v⌋ such that ⌊v⌋ u = v × u. Batched: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_norm(q):
    """Normalize a JPL quaternion and enforce a non-negative scalar part."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., 3:4] < 0, -q, q)


def quat_2_rot(q):
    """JPL quaternion -> rotation matrix R_GtoL.  (..., 4) -> (..., 3, 3).

    R = (2w² − 1) I − 2w ⌊q_v⌋ + 2 q_v q_vᵀ.
    """
    qv = q[..., :3]
    w = q[..., 3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), (*q.shape[:-1], 3, 3))
    outer = qv[..., :, None] * qv[..., None, :]
    return (
        (2.0 * w**2 - 1.0)[..., None, None] * eye
        - 2.0 * w[..., None, None] * skew(qv)
        + 2.0 * outer
    )


def rot_2_quat(R):
    """Rotation matrix -> JPL quaternion. Branch-free max-trace selection.

    Inverse of :func:`quat_2_rot`; uses the numerically stable 4-way case
    split (Trawny eq. 98-99) expressed as a masked select so it is jit/vmap
    safe. (..., 3, 3) -> (..., 4).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # Case w: trace largest.
    tw = _safe_sqrt(1.0 + tr)  # = 2w
    qw = jnp.stack([(r12 - r21) / (2 * tw), (r20 - r02) / (2 * tw), (r01 - r10) / (2 * tw), 0.5 * tw], axis=-1)
    # Case x.
    tx = _safe_sqrt(1.0 + 2 * r00 - tr)
    qx = jnp.stack([0.5 * tx, (r01 + r10) / (2 * tx), (r02 + r20) / (2 * tx), (r12 - r21) / (2 * tx)], axis=-1)
    # Case y.
    ty = _safe_sqrt(1.0 + 2 * r11 - tr)
    qy = jnp.stack([(r01 + r10) / (2 * ty), 0.5 * ty, (r12 + r21) / (2 * ty), (r20 - r02) / (2 * ty)], axis=-1)
    # Case z.
    tz = _safe_sqrt(1.0 + 2 * r22 - tr)
    qz = jnp.stack([(r02 + r20) / (2 * tz), (r12 + r21) / (2 * tz), 0.5 * tz, (r01 - r10) / (2 * tz)], axis=-1)

    cond_w = (tr >= r00) & (tr >= r11) & (tr >= r22)
    cond_x = (r00 >= tr) & (r00 >= r11) & (r00 >= r22)
    cond_y = (r11 >= tr) & (r11 >= r00) & (r11 >= r22)

    q = jnp.where(
        cond_w[..., None], qw,
        jnp.where(cond_x[..., None], qx, jnp.where(cond_y[..., None], qy, qz)),
    )
    return quat_norm(q)


def quat_multiply(q, p):
    """JPL quaternion product q ⊗ p with R(q ⊗ p) = R(q) R(p). (..., 4)x(..., 4) -> (..., 4)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    px, py, pz, pw = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    out = jnp.stack(
        [
            qw * px + qz * py - qy * pz + qx * pw,
            -qz * px + qw * py + qx * pz + qy * pw,
            qy * px - qx * py + qw * pz + qz * pw,
            -qx * px - qy * py - qz * pz + qw * pw,
        ],
        axis=-1,
    )
    return quat_norm(out)


def quat_inv(q):
    """Inverse (conjugate) of a unit JPL quaternion."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def omega(w):
    """Ω(ω): 4×4 matrix with q̇ = ½ Ω(ω) q for JPL quaternions. (..., 3) -> (..., 4, 4)."""
    top = jnp.concatenate([-skew(w), w[..., :, None]], axis=-1)  # (..., 3, 4)
    bot = jnp.concatenate([-w[..., None, :], jnp.zeros_like(w[..., :1, None])], axis=-1)  # (..., 1, 4)
    return jnp.concatenate([top, bot], axis=-2)


def _sinc_taylor(theta):
    """sin(θ)/θ with the θ→0 limit handled."""
    small = theta < 1e-7
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 - theta**2 / 6.0, jnp.sin(safe) / safe)


def exp_so3(w):
    """SO(3) exponential map. (..., 3) -> (..., 3, 3). Rodrigues with Taylor limits.

    jvp-safe at w = 0: works from θ² = Σw² (smooth everywhere) and takes the
    sqrt only of a where-guarded value — `norm(w)` has a NaN derivative at
    the origin, which a post-hoc `where` cannot mask (the NaN enters through
    the unselected branch's tangent)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-14
    theta2_s = jnp.where(small, 1.0, theta2)
    theta_s = jnp.sqrt(theta2_s)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta_s) / theta_s)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta_s)) / theta2_s)
    W = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * (W @ W)


def log_so3(R):
    """SO(3) logarithm map. (..., 3, 3) -> (..., 3).

    Branch-free via the quaternion: for q = rot_2_quat(R) (JPL),
    R = exp_so3(−θ a) with θ = 2·atan2(‖q_v‖, q_w), a = q_v/‖q_v‖, so
    w = −θ·q_v/‖q_v‖. rot_2_quat's 4-way max-trace selection makes this
    numerically robust everywhere, including θ = π where the classic
    vee/sinc formula is catastrophically ill-conditioned.
    """
    q = rot_2_quat(R)
    qv = q[..., 0:3]
    qw = q[..., 3]  # ≥ 0 after quat_norm, so θ ∈ [0, π]
    nv = jnp.linalg.norm(qv, axis=-1)
    theta = 2.0 * jnp.arctan2(nv, qw)
    # θ/‖q_v‖ → 2/q_w as ‖q_v‖ → 0.
    scale = jnp.where(nv < 1e-12, 2.0 / jnp.maximum(qw, 1e-12), theta / jnp.where(nv < 1e-12, 1.0, nv))
    return -qv * scale[..., None]


def jr_so3(w):
    """Right Jacobian of SO(3): Jr(ω) = I − (1−cosθ)/θ² ⌊ω⌋ + (θ−sinθ)/θ³ ⌊ω⌋².

    jvp-safe at ω = 0 (see exp_so3: θ² first, sqrt of a guarded value)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-14
    theta2_s = jnp.where(small, 1.0, theta2)
    safe = jnp.sqrt(theta2_s)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe)) / theta2_s)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (safe - jnp.sin(safe)) / (theta2_s * safe))
    W = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - B[..., None, None] * W + C[..., None, None] * (W @ W)


def jl_so3(w):
    """Left Jacobian of SO(3): Jl(ω) = Jr(−ω)."""
    return jr_so3(-w)


def rot_x(t):
    """Rotation about the x-axis by angle t (radians)."""
    c, s = jnp.cos(t), jnp.sin(t)
    one, zero = jnp.ones_like(t), jnp.zeros_like(t)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=-1),
            jnp.stack([zero, c, s], axis=-1),
            jnp.stack([zero, -s, c], axis=-1),
        ],
        axis=-2,
    )


def rot_y(t):
    """Rotation about the y-axis by angle t (radians)."""
    c, s = jnp.cos(t), jnp.sin(t)
    one, zero = jnp.ones_like(t), jnp.zeros_like(t)
    return jnp.stack(
        [
            jnp.stack([c, zero, -s], axis=-1),
            jnp.stack([zero, one, zero], axis=-1),
            jnp.stack([s, zero, c], axis=-1),
        ],
        axis=-2,
    )


def rot_z(t):
    """Rotation about the z-axis by angle t (radians)."""
    c, s = jnp.cos(t), jnp.sin(t)
    one, zero = jnp.ones_like(t), jnp.zeros_like(t)
    return jnp.stack(
        [
            jnp.stack([c, s, zero], axis=-1),
            jnp.stack([-s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def rot2rpy(R):
    """Rotation matrix -> (roll, pitch, yaw) with R = rot_z(yaw) rot_y(pitch) rot_x(roll)ᵀ-convention
    matching the reference's rot2rpy (used for debug printing only)."""
    pitch = jnp.arctan2(-R[..., 2, 0], jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2))
    near = jnp.abs(jnp.cos(pitch)) < 1e-7
    roll = jnp.where(near, 0.0, jnp.arctan2(R[..., 2, 1], R[..., 2, 2]))
    yaw = jnp.where(near, jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]), jnp.arctan2(R[..., 1, 0], R[..., 0, 0]))
    return jnp.stack([roll, pitch, yaw], axis=-1)
