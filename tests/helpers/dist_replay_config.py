"""Shared tiny replay config for the 2-process distributed test: both the
workers and the in-process oracle must build the identical deterministic
sim + engine."""


def make_cfg_sim():
    from ov_plane_tpu.sim.simulator import build_sim
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.sim.traj_duration = 5.0
    cfg.state.max_slam_features = 0
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 20
    cfg.num_pts_plane = 0
    cfg.tpu.max_features = 64
    cfg.tpu.max_obs_per_frame = 48
    cfg.tpu.max_msckf_update = 24
    sim = build_sim(cfg, max_obs=48)
    return cfg, sim
