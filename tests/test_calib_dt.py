"""Camera-IMU time-offset calibration: starting from a wrong dt, the filter
must reduce the offset error (Li & Mourikis clone-Jacobian scheme,
StateHelper::augment_clone, StateHelper.cpp:613-624)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config


@pytest.mark.slow
def test_time_offset_converges():
    dt_true = 0.015
    cfg = sim_config()
    cfg.sim.traj_duration = 16.0
    cfg.calib_camimu_dt = dt_true
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = True
    cfg.num_pts = 50
    cfg.num_pts_plane = 0
    cfg.tpu.max_features = 160
    cfg.tpu.max_obs_per_frame = 80
    cfg.tpu.max_msckf_update = 40
    sim = build_sim(cfg, max_obs=80)

    # Estimator starts believing dt = 0.
    cfg_est = dataclasses.replace(cfg)
    cfg_est.calib_camimu_dt = 0.0

    eng = VioEngine.from_config(cfg_est)
    state = init_state_with_gt(
        eng, cfg_est, t0=sim.cam_t[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    state, bank, outs = run_sequence(eng, state, bank, sim, imu_window=cfg.tpu.max_imu_per_frame)

    dt_est = float(state.calib_dt)
    err0 = abs(0.0 - dt_true)
    err1 = abs(dt_est - dt_true)
    assert err1 < 0.5 * err0, f"time offset did not converge: {err0*1e3:.1f}ms -> {err1*1e3:.1f}ms"
    # Trajectory must stay bounded despite the initial 15 ms offset.
    final_err = float(jnp.linalg.norm(outs.p[-1] - sim.gt_p[-1]))
    assert final_err < 0.5, final_err
