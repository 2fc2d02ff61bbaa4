"""Config-1 parity: replay a segment of the reference's udel_arl trajectory
(BASELINE.json config 1) when the reference data is mounted."""

import os

import jax.numpy as jnp
import pytest

from ov_plane_tpu.eval.metrics import rmse_nees
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config

UDEL_ARL = "/root/reference/data/udel_arl_short.txt"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(UDEL_ARL), reason="reference data not mounted")
def test_udel_arl_segment_point_only():
    cfg = sim_config()
    cfg.sim.traj_path = UDEL_ARL
    cfg.sim.traj_duration = 25.0
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 50
    cfg.num_pts_plane = 0
    cfg.tpu.max_features = 160
    cfg.tpu.max_obs_per_frame = 80
    cfg.tpu.max_msckf_update = 40
    sim = build_sim(cfg, max_obs=80)
    assert sim.cam_t_imu.shape[0] > 50

    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(
        eng, cfg, t0=sim.cam_t[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    state, bank, outs = run_sequence(eng, state, bank, sim, imu_window=cfg.tpu.max_imu_per_frame)
    m = rmse_nees(outs.q, outs.p, outs.cov_diag_imu[:, 0:3], outs.cov_diag_imu[:, 3:6],
                  sim.gt_q[1:], sim.gt_p[1:])
    rmse_pos = float(m["rmse_pos"])
    assert rmse_pos < 0.25, {k: float(v) for k, v in m.items()}
    assert 0.02 < float(m["nees_ori"]) < 15.0

def test_loaded_trajectory_rebased_f32_safe():
    """Recorded trajectories carry absolute epochs (~1.55e9 s) where float32
    resolution is 128 s; the loader must rebase to t=0 so the TPU f32 cast
    keeps every frame timestamp (and dt) distinct."""
    import numpy as np

    from ov_plane_tpu.sim.trajectory import load_trajectory_txt

    times, pos, quat = load_trajectory_txt("/root/reference/data/udel_arl_short.txt")
    assert times[0] == 0.0
    t32 = times.astype(np.float32)
    assert (np.diff(t32) > 0).all(), "f32 cast collapsed timestamps"
