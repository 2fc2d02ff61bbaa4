"""Dynamic initialization: recover velocity/gravity/features from a moving
window of the simulator (ov_init DynamicInitializer linear stage parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.models.dyn_init import DynInitOptions, dynamic_initialize
from ov_plane_tpu.ops.quat import quat_2_rot
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config


@pytest.mark.slow
def test_dynamic_init_recovers_state():
    cfg = sim_config()
    cfg.sim.traj_duration = 8.0
    cfg.num_pts = 40
    cfg.num_pts_plane = 0
    cfg.tpu.max_obs_per_frame = 64
    # Noise-free measurements isolate the linear solver's geometry.
    cfg.imu_noises.sigma_w = 1e-12
    cfg.imu_noises.sigma_wb = 1e-12
    cfg.imu_noises.sigma_a = 1e-12
    cfg.imu_noises.sigma_ab = 1e-12
    cfg.msckf_options.sigma_pix = 1e-9
    sim = build_sim(cfg, max_obs=64)

    # Window: 6 poses evenly spread over ~2 s (the reference's
    # init_window_time / init_dyn_num_pose layout — a short window makes
    # gravity weakly observable).
    P = 6
    pose_idx = 5 + 4 * np.arange(P)
    t_poses = np.asarray(sim.cam_t_imu)[pose_idx]

    # Candidate features: tracked through the whole window.
    ids = np.asarray(sim.obs_id)[pose_idx]           # [P, O]
    common = set(ids[0][ids[0] >= 0])
    for k in range(1, P):
        common &= set(ids[k][ids[k] >= 0])
    common = sorted(common)[:12]
    F = len(common)
    assert F >= 6, f"only {F} common features"

    # Normalized observations (undistort the noiseless uvs).
    from ov_plane_tpu.ops import cams

    zeta = jnp.asarray(cfg.cam_intrinsics)
    uvn = np.zeros((P, F, 2))
    mask = np.zeros((P, F), bool)
    uvs = np.asarray(sim.obs_uv_true)[pose_idx]
    for k in range(P):
        for fi, fid in enumerate(common):
            j = np.nonzero(ids[k] == fid)[0]
            if len(j):
                uvn[k, fi] = np.asarray(cams.undistort(jnp.asarray(uvs[k, j[0]]), zeta, cams.RADTAN))
                mask[k, fi] = True

    lo = np.searchsorted(np.asarray(sim.imu_t), t_poses[0]) - 1
    hi = np.searchsorted(np.asarray(sim.imu_t), t_poses[-1]) + 2
    opts = DynInitOptions(num_pose=P, max_feats=F, min_deg=1.0)
    from ov_plane_tpu.ops.quat import quat_2_rot as q2r

    R_ItoC = q2r(jnp.asarray(cfg.cam_extrinsics[0:4]))
    ok, q_GtoI0, v0_G, g_err, p_f_G, feat_ok = dynamic_initialize(
        jnp.asarray(np.asarray(sim.imu_t)[lo:hi]),
        jnp.asarray(np.asarray(sim.imu_w)[lo:hi]),
        jnp.asarray(np.asarray(sim.imu_a)[lo:hi]),
        jnp.asarray(t_poses), jnp.asarray(uvn), jnp.asarray(mask),
        R_ItoC, jnp.asarray(cfg.cam_extrinsics[4:7]), opts,
    )
    assert bool(ok), f"init rejected (g_err={float(g_err):.3f})"
    assert float(g_err) < 0.05, float(g_err)

    # Velocity magnitude matches ground truth (frame differs by yaw only).
    v_gt = np.asarray(sim.gt_v)[pose_idx[0]]
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v0_G)), np.linalg.norm(v_gt), atol=0.05)
    # Gravity direction: R_GtoI0's third column should match the true one.
    R_true = np.asarray(quat_2_rot(sim.gt_q[pose_idx[0]]))
    R_est = np.asarray(quat_2_rot(q_GtoI0))
    np.testing.assert_allclose(R_est[:, 2], R_true[:, 2], atol=0.02)
    # Vertical velocity component is fully observable (yaw-invariant).
    np.testing.assert_allclose(float(v0_G[2]), v_gt[2], atol=0.05)

@pytest.mark.slow
def test_dynamic_mle_refines_biased_window():
    """MLE refinement (ov_init fit_mle equivalent): with IMU biases and pixel
    noise the zero-bias linear solve degrades; the shooting MLE recovers the
    biases and tightens gravity/velocity."""
    from ov_plane_tpu.models.dyn_init import dynamic_mle_refine

    cfg = sim_config()
    cfg.sim.traj_duration = 8.0
    cfg.num_pts = 40
    cfg.num_pts_plane = 0
    cfg.tpu.max_obs_per_frame = 64
    cfg.imu_noises.sigma_w = 1e-12
    cfg.imu_noises.sigma_wb = 1e-12
    cfg.imu_noises.sigma_a = 1e-12
    cfg.imu_noises.sigma_ab = 1e-12
    cfg.msckf_options.sigma_pix = 1e-9
    sim = build_sim(cfg, max_obs=64)

    P = 6
    pose_idx = 5 + 4 * np.arange(P)
    t_poses = np.asarray(sim.cam_t_imu)[pose_idx]
    ids = np.asarray(sim.obs_id)[pose_idx]
    common = set(ids[0][ids[0] >= 0])
    for k in range(1, P):
        common &= set(ids[k][ids[k] >= 0])
    common = sorted(common)[:12]
    F = len(common)

    from ov_plane_tpu.ops import cams
    zeta = jnp.asarray(cfg.cam_intrinsics)
    rng = np.random.default_rng(3)
    uvn = np.zeros((P, F, 2))
    mask = np.zeros((P, F), bool)
    uvs = np.asarray(sim.obs_uv_true)[pose_idx]
    for k in range(P):
        for fi, fid in enumerate(common):
            j = np.nonzero(ids[k] == fid)[0]
            if len(j):
                u = np.asarray(cams.undistort(jnp.asarray(uvs[k, j[0]]), zeta, cams.RADTAN))
                uvn[k, fi] = u + rng.normal(0, 0.5 / 460.0, 2)   # 0.5 px noise
                mask[k, fi] = True

    lo = np.searchsorted(np.asarray(sim.imu_t), t_poses[0]) - 1
    hi = np.searchsorted(np.asarray(sim.imu_t), t_poses[-1]) + 2
    # Constant sensor biases the linear stage cannot model.
    bg_true = np.array([0.004, -0.006, 0.003])
    ba_true = np.array([0.05, -0.08, 0.06])
    imu_t = np.asarray(sim.imu_t)[lo:hi]
    imu_w = np.asarray(sim.imu_w)[lo:hi] + bg_true
    imu_a = np.asarray(sim.imu_a)[lo:hi] + ba_true

    opts = DynInitOptions(num_pose=P, max_feats=F, min_deg=1.0, max_gravity_err=1.0)
    R_ItoC = quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4]))
    p_IinC = jnp.asarray(cfg.cam_extrinsics[4:7])
    args = (jnp.asarray(imu_t), jnp.asarray(imu_w), jnp.asarray(imu_a),
            jnp.asarray(t_poses), jnp.asarray(uvn), jnp.asarray(mask), R_ItoC, p_IinC)
    ok_lin, q_lin, v_lin, gerr_lin, pf_lin, fok = dynamic_initialize(*args, opts)

    # Reconstruct the linear stage's I0-frame quantities for the MLE seed.
    R_lin = quat_2_rot(q_lin)
    v0_I0 = R_lin @ v_lin
    g_I0 = R_lin @ jnp.asarray([0.0, 0.0, opts.gravity_mag])
    pf_I0 = jnp.einsum("ij,fj->fi", R_lin, pf_lin)
    ok, q_mle, v_mle, bg, ba, pf_G, gerr_mle, cost = dynamic_mle_refine(
        *args, v0_I0, g_I0, pf_I0, fok, opts)

    assert bool(ok)
    # Bias recovery: gyro bias is strongly observable; accel bias trades off
    # against gravity tilt over a short window (the reference inflates its
    # init covariance 100x for the same reason) -- bound it loosely.
    np.testing.assert_allclose(np.asarray(bg), bg_true, atol=2e-3)
    assert np.linalg.norm(np.asarray(ba) - ba_true) < 0.12
    # Velocity error shrinks vs. the biased linear solution.
    v_gt = np.asarray(sim.gt_v)[pose_idx[0]]
    err_lin = abs(np.linalg.norm(np.asarray(v_lin)) - np.linalg.norm(v_gt))
    err_mle = abs(np.linalg.norm(np.asarray(v_mle)) - np.linalg.norm(v_gt))
    assert err_mle < err_lin
    assert err_mle < 0.05
    # Gravity direction after refinement.
    R_true = np.asarray(quat_2_rot(sim.gt_q[pose_idx[0]]))
    R_est = np.asarray(quat_2_rot(q_mle))
    np.testing.assert_allclose(R_est[:, 2], R_true[:, 2], atol=0.03)
