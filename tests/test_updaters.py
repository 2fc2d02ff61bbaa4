"""Tests for ZUPT and the static inertial initializer."""

import jax.numpy as jnp
import pytest
import numpy as np

from ov_plane_tpu.models.initializer import InitOptions, static_initialize
from ov_plane_tpu.models.zupt import ZuptOptions, compute_disparity, try_zupt
from ov_plane_tpu.ops.quat import quat_2_rot
from ov_plane_tpu.state.layout import StateLayout
from ov_plane_tpu.state.vio_state import VioState

RNG = np.random.default_rng(11)
LAY = StateLayout(max_clones=3, max_slam=2, max_planes=1)


def _tilted_R(roll=0.15, pitch=-0.1):
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    return (Ry @ Rx).T  # R_GtoI


def test_static_initialize_recovers_gravity_and_biases():
    g = 9.81
    R_GtoI = _tilted_R()
    bg_true = np.array([0.002, -0.001, 0.003])
    ba_true = np.array([0.05, -0.02, 0.01])
    hz = 200.0
    n = int(5.0 * hz)
    t = np.arange(n) / hz
    w_m = bg_true + 1e-5 * RNG.normal(size=(n, 3))
    a_m = (R_GtoI @ np.array([0, 0, g])) + ba_true + 1e-4 * RNG.normal(size=(n, 3))
    # Jerk in the last 2 s window.
    jerk = t > 3.0
    a_m[jerk] += 3.0 * np.sin(40 * t[jerk])[:, None] * np.array([1.0, 0.5, 0.2])

    opts = InitOptions(window_time=2.0, imu_thresh=1.0, gravity_mag=g)
    ok, t0, imu16, cov_diag = static_initialize(
        jnp.asarray(t), jnp.asarray(w_m), jnp.asarray(a_m), 5.0, opts
    )
    assert bool(ok)
    R_est = np.asarray(quat_2_rot(imu16[0:4]))
    # Gravity direction must match the third column of R_GtoI up to the
    # inherent static-init tilt bias |ba|/g ≈ 0.006 (bias and gravity are
    # inseparable without motion — same limitation as the reference).
    np.testing.assert_allclose(R_est[:, 2], R_GtoI[:, 2], atol=1.5 * np.linalg.norm([0.05, -0.02, 0.01]) / 9.81)
    np.testing.assert_allclose(np.asarray(imu16[10:13]), bg_true, atol=1e-4)
    # ba is recovered up to the same gravity direction.
    np.testing.assert_allclose(
        np.asarray(imu16[13:16]), a_m[: int(3 * 200)].mean(0) - R_est @ np.array([0, 0, g]), atol=2e-2
    )


def test_static_initialize_rejects_motion():
    hz, n = 200.0, 1000
    t = np.arange(n) / hz
    a_m = 9.81 * np.tile([0, 0, 1.0], (n, 1)) + 3.0 * np.sin(10 * t)[:, None]  # always moving
    w_m = np.zeros((n, 3))
    ok, *_ = static_initialize(jnp.asarray(t), jnp.asarray(w_m), jnp.asarray(a_m), 5.0,
                               InitOptions())
    assert not bool(ok)


def _stationary_state():
    st = VioState.create(LAY)
    st = st.replace(cov=jnp.eye(LAY.dim) * 1e-4, t=jnp.asarray(0.0))
    return st


def test_zupt_accept_stationary_reject_moving():
    st = _stationary_state()
    hz = 100.0
    n = 21
    t = jnp.asarray(np.arange(n) / hz)
    w_m = jnp.asarray(1e-5 * RNG.normal(size=(n, 3)))
    a_m = jnp.asarray(np.tile([0, 0, 9.81], (n, 1)) + 1e-4 * RNG.normal(size=(n, 3)))
    opts = ZuptOptions(chi2_multipler=1.0, noise_multiplier=10.0, gravity_mag=9.81)
    new_st, acc = try_zupt(st, opts, t, w_m, a_m, 0.2, jnp.asarray(10.0), jnp.asarray(0))
    assert bool(acc)
    assert float(new_st.t) == 0.2
    # Covariance of biases should not explode; diag positive.
    assert float(jnp.min(jnp.diag(new_st.cov)[:15])) > 0

    # Strong rotation → rejected.
    w_fast = jnp.asarray(np.tile([0.5, 0, 0], (n, 1)))
    _, acc2 = try_zupt(st, opts, t, w_fast, a_m, 0.2, jnp.asarray(10.0), jnp.asarray(0))
    assert not bool(acc2)

    # Low disparity overrides: accepted even with motion.
    _, acc3 = try_zupt(st, opts, t, w_fast, a_m, 0.2, jnp.asarray(0.1), jnp.asarray(50))
    assert bool(acc3)


def test_compute_disparity():
    uv = np.zeros((5, 4, 2))
    mask = np.zeros((5, 4), bool)
    uv[:, 0] = [[0, 0]] * 5
    uv[:, 1] = [[3, 4]] * 5
    mask[:3, 0] = True
    mask[:3, 1] = True
    avg, n = compute_disparity(jnp.asarray(uv), jnp.asarray(mask), 0, 1)
    assert int(n) == 3
    np.testing.assert_allclose(float(avg), 5.0)


def test_zupt_in_step_skips_cloning():
    """Integration: with try_zupt on and a stationary platform, the frame step
    applies the ZUPT (time advances, no new clone, no features consumed)."""
    import jax
    from ov_plane_tpu.models.feature_bank import FeatureBank
    from ov_plane_tpu.models.manager import FrameData, VioEngine, init_state_with_gt, step
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.try_zupt = True
    cfg.zupt_options.chi2_multipler = 1.0
    cfg.zupt_max_disparity = 0.0  # disable the disparity override (imu-only)
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.tpu.max_features = 32
    cfg.tpu.max_obs_per_frame = 16
    cfg.tpu.max_msckf_update = 8
    cfg.tpu.max_imu_per_frame = 16

    eng = VioEngine.from_config(cfg)
    q0 = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    state = init_state_with_gt(eng, cfg, t0=0.0, q0=q0, p0=jnp.zeros(3), v0=jnp.zeros(3),
                               bg0=jnp.zeros(3), ba0=jnp.zeros(3))
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)

    n = cfg.tpu.max_imu_per_frame
    for k in range(3):
        ts = jnp.asarray(np.linspace(k * 0.1, (k + 1) * 0.1, n))
        frame = FrameData(
            imu_t=ts,
            imu_w=jnp.asarray(1e-5 * RNG.normal(size=(n, 3))),
            imu_a=jnp.asarray(np.tile([0, 0, cfg.gravity_mag], (n, 1)) + 1e-4 * RNG.normal(size=(n, 3))),
            t_new=jnp.asarray((k + 1) * 0.1),
            obs_id=jnp.full(16, -1, jnp.int32),
            obs_uv=jnp.zeros((16, 2)),
            obs_plane=jnp.full(16, -1, jnp.int32),
        )
        state, bank, out = step(eng, state, bank, frame)

    # Stationary frames are absorbed by ZUPTs: no clones accumulate and the
    # platform is still considered unmoved.
    assert float(state.t) == pytest.approx(0.3)
    assert int(state.num_clones) == 0
    assert not bool(state.has_moved)


def test_zupt_integrated_accel_variant():
    """Integrated-accel formulation (UpdaterZeroVelocity.cpp:159-167): same
    stationary-accept / rotating-reject behavior through the velocity
    integral rows."""
    st = _stationary_state()
    hz, n = 100.0, 21
    t = jnp.asarray(np.arange(n) / hz)
    w_m = jnp.asarray(1e-5 * RNG.normal(size=(n, 3)))
    a_m = jnp.asarray(np.tile([0, 0, 9.81], (n, 1)) + 1e-4 * RNG.normal(size=(n, 3)))
    opts = ZuptOptions(chi2_multipler=1.0, noise_multiplier=10.0, gravity_mag=9.81,
                       integrated_accel=True)
    new_st, acc = try_zupt(st, opts, t, w_m, a_m, 0.2, jnp.asarray(10.0), jnp.asarray(0))
    assert bool(acc)
    assert float(jnp.min(jnp.diag(new_st.cov)[:15])) > 0

    w_fast = jnp.asarray(np.tile([0.5, 0, 0], (n, 1)))
    _, acc2 = try_zupt(st, opts, t, w_fast, a_m, 0.2, jnp.asarray(10.0), jnp.asarray(0))
    assert not bool(acc2)

    # A nonzero-velocity state violates the integral constraint -> rejected.
    st_v = st.replace(imu=st.imu.at[7:10].set(jnp.asarray([0.5, 0.0, 0.0])))
    _, acc3 = try_zupt(st_v, opts, t, w_m, a_m, 0.2, jnp.asarray(10.0), jnp.asarray(0))
    assert not bool(acc3)


def test_zupt_explicit_zero_motion_in_step():
    """Explicit zero-motion variant in the frame step: after one moving frame
    (which clones), stationary frames constrain the relative pose to zero and
    free the transient clone (UpdaterZeroVelocity.cpp:252-313)."""
    import jax
    from ov_plane_tpu.models.feature_bank import FeatureBank
    from ov_plane_tpu.models.manager import FrameData, VioEngine, init_state_with_gt, step
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.try_zupt = True
    cfg.zupt_options.chi2_multipler = 1.0
    cfg.zupt_max_disparity = 0.0
    cfg.zupt_only_at_beginning = False
    cfg.zupt_explicit_zero_motion = True
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.tpu.max_features = 32
    cfg.tpu.max_obs_per_frame = 16
    cfg.tpu.max_msckf_update = 8
    cfg.tpu.max_imu_per_frame = 16

    eng = VioEngine.from_config(cfg)
    q0 = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    state = init_state_with_gt(eng, cfg, t0=0.0, q0=q0, p0=jnp.zeros(3), v0=jnp.zeros(3),
                               bg0=jnp.zeros(3), ba0=jnp.zeros(3))
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    n = cfg.tpu.max_imu_per_frame
    empty = dict(obs_id=jnp.full(16, -1, jnp.int32), obs_uv=jnp.zeros((16, 2)),
                 obs_plane=jnp.full(16, -1, jnp.int32))

    # Frame 1: strong rotation -> ZUPT rejected, normal path clones.
    ts = jnp.asarray(np.linspace(0.0, 0.1, n))
    frame = FrameData(imu_t=ts, imu_w=jnp.asarray(np.tile([0.5, 0, 0], (n, 1))),
                      imu_a=jnp.asarray(np.tile([0, 0, cfg.gravity_mag], (n, 1))),
                      t_new=jnp.asarray(0.1), **empty)
    state, bank, _ = step(eng, state, bank, frame)
    assert int(state.num_clones) == 1
    v_after_motion = float(jnp.linalg.norm(state.imu[7:10]))

    # Frames 2-3: stationary -> explicit ZUPT (clone count stays, vel pulled
    # toward zero through the soft sigma_v = 0.1 constraint). A stationary
    # tilted IMU measures R_GtoI * g in the body frame.
    from ov_plane_tpu.ops.quat import quat_2_rot as q2r
    for k in range(1, 3):
        ts = jnp.asarray(np.linspace(k * 0.1, (k + 1) * 0.1, n))
        a_body = np.asarray(q2r(state.imu[0:4])) @ np.array([0, 0, cfg.gravity_mag])
        frame = FrameData(
            imu_t=ts, imu_w=jnp.asarray(1e-5 * RNG.normal(size=(n, 3))),
            imu_a=jnp.asarray(np.tile(a_body, (n, 1)) + 1e-4 * RNG.normal(size=(n, 3))),
            t_new=jnp.asarray((k + 1) * 0.1), **empty)
        state, bank, _ = step(eng, state, bank, frame)

    assert float(state.t) == pytest.approx(0.3)
    assert int(state.num_clones) == 1          # transient clones freed
    v_final = float(jnp.linalg.norm(state.imu[7:10]))
    assert v_final < v_after_motion and v_final < 0.02
    assert float(jnp.min(jnp.diag(state.cov)[:15])) > 0
    assert np.isfinite(np.asarray(state.cov)).all()
