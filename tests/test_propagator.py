"""Propagator tests: RK4 mean vs a SciPy ODE oracle, Φ vs finite differences
(SURVEY.md §7.2 step 3)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

from ov_plane_tpu.ops.quat import quat_2_rot
from ov_plane_tpu.state import propagator as prop
from ov_plane_tpu.state.layout import StateLayout
from ov_plane_tpu.state.vio_state import VioState

GRAVITY = np.array([0.0, 0.0, 9.81])
NOISES = jnp.asarray([1.6968e-4**2, 2.0e-3**2, 1.9393e-5**2, 3.0e-3**2])
LAY = StateLayout(max_clones=3, max_slam=2, max_planes=1)


def w_func(t):
    return np.array([0.4 * np.sin(2 * t), 0.3 * np.cos(3 * t), 0.2 + 0.1 * t])


def a_func(t):
    return np.array([0.5 * np.cos(t), -0.4 * np.sin(2 * t), 9.81 + 0.2 * np.sin(t)])


def omega_np(w):
    wx, wy, wz = w
    return np.array(
        [[0, wz, -wy, wx], [-wz, 0, wx, wy], [wy, -wx, 0, wz], [-wx, -wy, -wz, 0]]
    )


def quat2rot_np(q):
    x, y, z, w = q
    qv = np.array([x, y, z])
    sk = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    return (2 * w**2 - 1) * np.eye(3) - 2 * w * sk + 2 * np.outer(qv, qv)


def ode_oracle(t0, t1, q0, p0, v0):
    """SciPy high-accuracy integration of the IMU kinematics (JPL)."""

    def rhs(t, y):
        q, p, v = y[0:4], y[4:7], y[7:10]
        q = q / np.linalg.norm(q)
        dq = 0.5 * omega_np(w_func(t)) @ q
        dp = v
        dv = quat2rot_np(q).T @ a_func(t) - GRAVITY
        return np.concatenate([dq, dp, dv])

    y0 = np.concatenate([q0, p0, v0])
    sol = solve_ivp(rhs, (t0, t1), y0, rtol=1e-12, atol=1e-12, dense_output=False)
    y = sol.y[:, -1]
    y[0:4] /= np.linalg.norm(y[0:4])
    return y


def _init():
    q0 = np.array([0.1, -0.2, 0.3, 0.9])
    q0 /= np.linalg.norm(q0)
    return q0, np.array([1.0, 2.0, 3.0]), np.array([0.1, -0.1, 0.2])


def test_rk4_mean_matches_ode_oracle():
    """Feed perfect IMU samples of analytic (w, a_body) signals; RK4 at 400 Hz
    must track the tight-tolerance SciPy solution."""
    q0, p0, v0 = _init()
    t0, t1 = 0.0, 0.1
    hz = 400.0
    ts = np.arange(t0 - 1e-9, t1 + 0.6 / hz, 1.0 / hz)
    ws = np.stack([w_func(t) for t in ts])
    accs = np.stack([a_func(t) for t in ts])  # body-frame specific force

    y_ref = ode_oracle(t0, t1, q0, p0, v0)

    imu0 = jnp.asarray(np.concatenate([q0, p0, v0, np.zeros(6)]))
    opts = prop.PropagatorOptions(use_rk4=True, do_fej=False)
    imu_n, _, phi, qd, _ = prop.propagate_mean_cov(
        imu0, imu0, jnp.asarray(ts), jnp.asarray(ws), jnp.asarray(accs),
        t0, t1, NOISES, jnp.asarray(GRAVITY), opts,
    )
    got = np.asarray(imu_n)
    ref_q = y_ref[0:4]
    if np.dot(got[0:4], ref_q) < 0:
        ref_q = -ref_q
    # RK4 @400 Hz with the reference's intermediate quaternion renormalization:
    # agreement to ~1e-7 is the expected truncation level over 0.1 s.
    np.testing.assert_allclose(got[0:4], ref_q, atol=5e-7)
    np.testing.assert_allclose(got[4:7], y_ref[4:7], atol=1e-7)
    np.testing.assert_allclose(got[7:10], y_ref[7:10], atol=1e-6)
    # Qd should be PSD and tiny for this dt.
    eigs = np.linalg.eigvalsh(np.asarray(qd))
    assert eigs.min() > -1e-18


def test_phi_matches_finite_difference():
    """Φ (non-FEJ) must predict the propagated perturbation of each error dof."""
    q0, p0, v0 = _init()
    bg = np.array([0.01, -0.02, 0.015])
    ba = np.array([-0.05, 0.03, 0.02])
    t0, t1 = 0.0, 0.05
    hz = 400.0
    ts = np.arange(t0 - 1e-9, t1 + 0.6 / hz, 1.0 / hz)
    ws = np.stack([w_func(t) + bg for t in ts])
    accs = np.stack([a_func(t) + ba for t in ts])

    opts = prop.PropagatorOptions(use_rk4=True, do_fej=False)

    def run(imu0):
        imu_n, _, phi, _, _ = prop.propagate_mean_cov(
            imu0, imu0, jnp.asarray(ts), jnp.asarray(ws), jnp.asarray(accs),
            t0, t1, NOISES, jnp.asarray(GRAVITY), opts,
        )
        return np.asarray(imu_n), np.asarray(phi)

    imu0 = np.concatenate([q0, p0, v0, bg, ba])
    nom, phi = run(jnp.asarray(imu0))

    def boxplus(imu, dx):
        from ov_plane_tpu.ops.quat import quat_multiply, quat_norm
        dq = np.asarray(quat_norm(jnp.asarray(np.concatenate([0.5 * dx[0:3], [1.0]]))))
        q = np.asarray(quat_multiply(jnp.asarray(dq), jnp.asarray(imu[0:4])))
        out = imu.copy()
        out[0:4] = q
        out[4:16] = imu[4:16] + dx[3:15]
        return out

    def boxminus(imu_a, imu_b):
        """error of a relative to b: [log-ish via small-angle, linear rest]."""
        from ov_plane_tpu.ops.quat import quat_multiply, quat_inv
        dq = np.asarray(quat_multiply(jnp.asarray(imu_a[0:4]), quat_inv(jnp.asarray(imu_b[0:4]))))
        dth = 2 * dq[0:3] / dq[3]
        return np.concatenate([dth, imu_a[4:16] - imu_b[4:16]])

    eps = 1e-6
    for i in range(15):
        dx = np.zeros(15)
        dx[i] = eps
        pert, _ = run(jnp.asarray(boxplus(imu0, dx)))
        derr = boxminus(pert, nom) / eps
        np.testing.assert_allclose(derr, phi[:, i], atol=5e-4,
                                   err_msg=f"Phi column {i}")


def test_propagate_and_clone_inserts_clone():
    state = VioState.create(LAY)
    q0, p0, v0 = _init()
    imu0 = jnp.asarray(np.concatenate([q0, p0, v0, np.zeros(6)]))
    cov0 = np.eye(LAY.dim) * 0.01
    state = state.replace(imu=imu0, imu_fej=imu0, cov=jnp.asarray(cov0), t=jnp.asarray(0.0))
    hz = 200.0
    ts = np.arange(-1e-9, 0.1 + 0.6 / hz, 1.0 / hz)
    ws = np.stack([w_func(t) for t in ts])
    accs = np.stack([a_func(t) for t in ts])
    opts = prop.PropagatorOptions()
    new, slot = prop.propagate_and_clone(
        state, jnp.asarray(ts), jnp.asarray(ws), jnp.asarray(accs), 0.1,
        NOISES, jnp.asarray(GRAVITY), opts,
    )
    s = int(slot)
    assert np.isfinite(float(new.clones_t[s]))
    np.testing.assert_allclose(np.asarray(new.clones_q[s]), np.asarray(new.imu[0:4]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(new.clones_p[s]), np.asarray(new.imu[4:7]), atol=1e-12)
    # Clone covariance block equals IMU pose block.
    c = LAY.clone_idx(s)
    cov = np.asarray(new.cov)
    np.testing.assert_allclose(cov[c:c + 6, c:c + 6], cov[0:6, 0:6], atol=1e-12)
    assert int(new.num_clones) == 1
    # Second clone at a later time goes to a different slot.
    ts2 = ts + 0.1
    new2, slot2 = prop.propagate_and_clone(
        new, jnp.asarray(ts2), jnp.asarray(ws), jnp.asarray(accs), 0.2,
        NOISES, jnp.asarray(GRAVITY), opts,
    )
    assert int(slot2) != s
    assert int(new2.num_clones) == 2
    # Marginalize with budget 1 drops the older clone.
    marg = prop.marginalize_oldest_clone(new2, 1)
    assert int(marg.num_clones) == 1
    assert float(marg.clones_t[s]) == -np.inf


def test_fast_state_propagate_highrate_odometry():
    """High-rate odometry (Propagator::fast_state_propagate): mean tracks the
    ODE oracle at arbitrary inter-update targets, the 15x15 covariance stays
    symmetric-PSD and grows with horizon, the filter state is untouched, and
    a vmapped batch of targets equals sequential calls (the TPU-native form
    of the per-IMU-message odometry callback, ROS1Visualizer.cpp:414-424)."""
    state = VioState.create(LAY)
    q0, p0, v0 = _init()
    imu0 = jnp.asarray(np.concatenate([q0, p0, v0, np.zeros(6)]))
    cov0 = np.eye(LAY.dim) * 0.01
    state = state.replace(imu=imu0, imu_fej=imu0, cov=jnp.asarray(cov0), t=jnp.asarray(0.0))

    hz = 400.0
    ts = np.arange(-1e-9, 0.12 + 0.6 / hz, 1.0 / hz)
    ws = np.stack([w_func(t) for t in ts])
    accs = np.stack([a_func(t) for t in ts])
    opts = prop.PropagatorOptions(use_rk4=True, do_fej=False)
    args = (jnp.asarray(ts), jnp.asarray(ws), jnp.asarray(accs))

    targets = np.array([0.03, 0.06, 0.09, 0.12])
    f = lambda tt: prop.fast_state_propagate(state, *args, tt, NOISES,
                                             jnp.asarray(GRAVITY), opts)
    imu_b, cov_b = jax.vmap(f)(jnp.asarray(targets))

    traces = []
    for k, tt in enumerate(targets):
        imu_n, cov15 = f(jnp.asarray(tt))
        # Batched == sequential.
        np.testing.assert_allclose(np.asarray(imu_b[k]), np.asarray(imu_n), atol=1e-12)
        np.testing.assert_allclose(np.asarray(cov_b[k]), np.asarray(cov15), atol=1e-12)
        # Mean matches the tight-tolerance ODE oracle.
        y_ref = ode_oracle(0.0, tt, q0, p0, v0)
        got = np.asarray(imu_n)
        ref_q = y_ref[0:4] if np.dot(got[0:4], y_ref[0:4]) >= 0 else -y_ref[0:4]
        np.testing.assert_allclose(got[0:4], ref_q, atol=5e-6)
        np.testing.assert_allclose(got[4:7], y_ref[4:7], atol=1e-5)
        c = np.asarray(cov15)
        np.testing.assert_allclose(c, c.T, atol=1e-12)
        assert np.linalg.eigvalsh(c).min() > 0
        traces.append(np.trace(c))
    # Covariance grows with the propagation horizon.
    assert all(b > a for a, b in zip(traces, traces[1:])), traces
    # No state mutation.
    np.testing.assert_allclose(np.asarray(state.imu), np.asarray(imu0), atol=0)
    assert float(state.t) == 0.0
