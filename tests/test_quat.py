"""Property tests for JPL quaternion / SO(3) ops against a SciPy oracle.

The reference has no unit tests (SURVEY.md §4); these oracle tests substitute
for them, per the build plan (SURVEY.md §7.2 step 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from ov_plane_tpu.ops import quat as q

RNG = np.random.default_rng(0)


def random_rotations(n):
    return ScipyRot.random(n, random_state=np.random.RandomState(42))


def jpl_from_scipy(rot):
    """Scipy quats are Hamilton [x,y,z,w] representing local-to-global;
    the JPL quat for R_GtoL equals the Hamilton quat of R_GtoL's inverse... —
    simplest identity: R(q_jpl) = rot.as_matrix().T works if we convert via matrices."""
    return np.asarray([q.rot_2_quat(jnp.asarray(m)) for m in rot.as_matrix()])


def test_quat_rot_roundtrip():
    rots = random_rotations(64).as_matrix()
    qs = jax.vmap(q.rot_2_quat)(jnp.asarray(rots))
    back = jax.vmap(q.quat_2_rot)(qs)
    np.testing.assert_allclose(np.asarray(back), rots, atol=1e-12)


def test_quat_rot_roundtrip_near_pi():
    # Degenerate trace cases: rotations by ~pi about random axes.
    axes = RNG.normal(size=(32, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = np.pi - RNG.uniform(0, 1e-5, size=(32, 1))
    rots = ScipyRot.from_rotvec(axes * angles).as_matrix()
    qs = jax.vmap(q.rot_2_quat)(jnp.asarray(rots))
    back = jax.vmap(q.quat_2_rot)(qs)
    np.testing.assert_allclose(np.asarray(back), rots, atol=1e-9)


def test_quat_multiply_matches_rotation_product():
    r1 = random_rotations(32).as_matrix()
    r2 = ScipyRot.random(32, random_state=np.random.RandomState(7)).as_matrix()
    q1 = jax.vmap(q.rot_2_quat)(jnp.asarray(r1))
    q2 = jax.vmap(q.rot_2_quat)(jnp.asarray(r2))
    q12 = jax.vmap(q.quat_multiply)(q1, q2)
    np.testing.assert_allclose(
        np.asarray(jax.vmap(q.quat_2_rot)(q12)), r1 @ r2, atol=1e-12
    )


def test_exp_log_roundtrip():
    # Keep |w| < pi: log returns the principal rotation vector.
    w = RNG.normal(size=(64, 3))
    w = w / np.linalg.norm(w, axis=1, keepdims=True) * RNG.uniform(1e-4, np.pi - 1e-3, size=(64, 1))
    R = jax.vmap(q.exp_so3)(jnp.asarray(w))
    # exp_so3(w) equals scipy's matrix for rotvec w (conventions agree on matrices)
    np.testing.assert_allclose(np.asarray(R), ScipyRot.from_rotvec(w).as_matrix(), atol=1e-12)
    w_back = jax.vmap(q.log_so3)(R)
    np.testing.assert_allclose(np.asarray(w_back), w, atol=1e-9)


def test_log_near_pi():
    axes = RNG.normal(size=(16, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    w = axes * (np.pi - 1e-7)
    R = ScipyRot.from_rotvec(w).as_matrix()
    w_back = np.array(jax.vmap(q.log_so3)(jnp.asarray(R)), copy=True)
    # Axis sign is ambiguous exactly at pi; compare rotations instead of vectors.
    R_back = ScipyRot.from_rotvec(w_back).as_matrix()
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_exp_small_angle():
    w = RNG.normal(size=(8, 3)) * 1e-9
    R = np.asarray(jax.vmap(q.exp_so3)(jnp.asarray(w)))
    np.testing.assert_allclose(R, ScipyRot.from_rotvec(w).as_matrix(), atol=1e-14)


def test_jr_so3_finite_difference():
    # Jr satisfies exp(w + dw) ≈ exp(w) exp(Jr(w) dw)  (right Jacobian).
    w = RNG.normal(size=(3,))
    dw = RNG.normal(size=(3,)) * 1e-6
    lhs = np.asarray(q.exp_so3(jnp.asarray(w + dw)))
    Jr = np.asarray(q.jr_so3(jnp.asarray(w)))
    rhs = np.asarray(q.exp_so3(jnp.asarray(w))) @ np.asarray(q.exp_so3(jnp.asarray(Jr @ dw)))
    # First-order identity: residual is O(|dw|²·curvature) ≈ 1e-8 for |dw| ~ 1e-6.
    np.testing.assert_allclose(lhs, rhs, atol=2e-7)


def test_omega_quaternion_derivative():
    # q(t+dt) ≈ (I + dt/2 Ω(w)) q(t) must match exp map composition for small dt.
    rot = random_rotations(1)
    q0 = q.rot_2_quat(jnp.asarray(rot.as_matrix()[0]))
    w = jnp.asarray(RNG.normal(size=(3,)))
    dt = 1e-8
    q_euler = np.asarray(q0) + dt * 0.5 * np.asarray(q.omega(w)) @ np.asarray(q0)
    q_euler /= np.linalg.norm(q_euler)
    # Ground truth: R(t+dt) = exp(-w dt) R(t)  (JPL: local angular velocity)
    R_true = np.asarray(q.exp_so3(-w * dt)) @ rot.as_matrix()[0]
    np.testing.assert_allclose(np.asarray(q.quat_2_rot(jnp.asarray(q_euler))), R_true, atol=1e-16 + 1e-9)


def test_skew_cross():
    a = RNG.normal(size=(10, 3))
    b = RNG.normal(size=(10, 3))
    np.testing.assert_allclose(
        np.einsum("nij,nj->ni", np.asarray(q.skew(jnp.asarray(a))), b),
        np.cross(a, b), atol=1e-14,
    )


def test_so3_maps_jvp_safe_at_origin():
    """d/dw of exp_so3 / jr_so3 (and the spline SE3 exp) must be finite at
    w = 0 EXACTLY: norm(w) has a NaN derivative at the origin that a post-hoc
    where() cannot mask. Zero twists occur for real (duplicate control poses
    when a trajectory hovers), and one NaN tangent poisons the whole
    jvp-derived velocity timeline."""
    import jax

    from ov_plane_tpu.ops.quat import exp_so3, jr_so3
    from ov_plane_tpu.ops.spline import _se3_exp

    z3 = jnp.zeros(3)
    for f in (exp_so3, jr_so3):
        val, tan = jax.jvp(f, (z3,), (jnp.ones(3),))
        assert np.isfinite(np.asarray(val)).all(), f
        assert np.isfinite(np.asarray(tan)).all(), f
    # d(exp_so3)/dw at 0 along direction u is skew-like: check against FD.
    u = jnp.asarray([0.3, -0.2, 0.5])
    _, tan = jax.jvp(exp_so3, (z3,), (u,))
    eps = 1e-7
    fd = (np.asarray(exp_so3(eps * u)) - np.asarray(exp_so3(-eps * u))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(tan), fd, atol=1e-6)

    val, tan = jax.jvp(_se3_exp, (jnp.zeros(6),), (jnp.ones(6),))
    for x in (*val, *tan):
        assert np.isfinite(np.asarray(x)).all()
