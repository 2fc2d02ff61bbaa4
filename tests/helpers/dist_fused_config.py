"""Shared config/scene for the 2-process FUSED vision test: both the workers
and the single-process oracle must build the identical tiny replay."""

import numpy as np

B_GLOBAL = 4
N_FRAMES = 4


def make_cfg_sim_frames():
    import jax.numpy as jnp

    from ov_plane_tpu.frontend.synthetic import render_frame
    from ov_plane_tpu.ops.quat import quat_2_rot
    from ov_plane_tpu.sim.simulator import build_sim
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.sim.traj_duration = 5.0
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 30
    cfg.num_pts_plane = 0
    cfg.cam_wh = [256, 192]
    cfg.cam_intrinsics = [160.0, 160.0, 128.0, 96.0, 0.0, 0.0, 0.0, 0.0]
    cfg.histogram_method = "NONE"
    cfg.tpu.max_features = 64
    cfg.tpu.max_obs_per_frame = 48
    cfg.tpu.max_msckf_update = 16
    sim = build_sim(cfg, max_obs=48)

    R_ItoC = np.asarray(quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4])))
    p_IinC = np.asarray(cfg.cam_extrinsics[4:7])
    zeta = np.asarray(cfg.cam_intrinsics)
    feat_p = np.asarray(sim.feat_p)
    noise = np.random.default_rng(3).normal(
        0.0, 0.01, (B_GLOBAL, cfg.cam_wh[1], cfg.cam_wh[0])).astype(np.float32)
    imgs = []                              # [N][B_GLOBAL, H, W]
    for i in range(1, N_FRAMES + 1):
        base = render_frame(feat_p, np.asarray(quat_2_rot(sim.gt_q[i])),
                            np.asarray(sim.gt_p[i]), R_ItoC, p_IinC, zeta, cfg.cam_wh)
        imgs.append(np.clip(base[None] + noise, 0.0, 1.0))
    return cfg, sim, imgs


def imu_window(cfg, sim, i):
    W = cfg.tpu.max_imu_per_frame
    imu_t, imu_w, imu_a = map(np.asarray, (sim.imu_t, sim.imu_w, sim.imu_a))
    s0 = int(sim.imu_window_start[i])
    it = np.full(W, np.inf)
    iw = np.zeros((W, 3))
    ia = np.zeros((W, 3))
    m = len(imu_t[s0:s0 + W])
    it[:m], iw[:m], ia[:m] = imu_t[s0:s0 + W], imu_w[s0:s0 + W], imu_a[s0:s0 + W]
    return it, iw, ia
