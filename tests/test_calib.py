"""Online camera calibration: starting from perturbed intrinsics/extrinsics,
the filter must reduce the calibration error (reference: sim_do_perturbation
robustness protocol, Simulator.cpp:243-275 + calib_cam_* options)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
from ov_plane_tpu.sim.simulator import build_sim, perturb_calibration
from ov_plane_tpu.utils.config import sim_config


@pytest.mark.slow
def test_calibration_converges():
    cfg = sim_config()
    cfg.sim.traj_duration = 20.0
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.do_calib_camera_pose = True
    cfg.state.do_calib_camera_intrinsics = True
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 50
    cfg.num_pts_plane = 0
    cfg.tpu.max_features = 160
    cfg.tpu.max_obs_per_frame = 80
    cfg.tpu.max_msckf_update = 40
    sim = build_sim(cfg, max_obs=80)

    # Filter starts from perturbed calibration.
    _, zeta_pert, ext_pert = perturb_calibration(cfg, seed=1)
    zeta_true = np.asarray(cfg.cam_intrinsics)
    ext_true = np.asarray(cfg.cam_extrinsics)

    import dataclasses

    cfg_est = dataclasses.replace(cfg)
    cfg_est.cam_intrinsics = zeta_pert.tolist()
    cfg_est.cam_extrinsics = ext_pert.tolist()

    eng = VioEngine.from_config(cfg_est)
    state = init_state_with_gt(
        eng, cfg_est, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    state, bank, outs = run_sequence(eng, state, bank, sim, imu_window=cfg.tpu.max_imu_per_frame)

    zeta_est = np.asarray(state.cam_zeta)
    err0 = np.linalg.norm(zeta_pert[0:4] - zeta_true[0:4])
    err1 = np.linalg.norm(zeta_est[0:4] - zeta_true[0:4])
    assert err1 < 0.6 * err0, f"intrinsics did not converge: {err0} -> {err1}"

    p_est = np.asarray(state.calib_cam[4:7])
    perr1 = np.linalg.norm(p_est - ext_true[4:7])
    # Extrinsic translation is only weakly observable over a short gentle
    # trajectory and can trade off against intrinsics — require boundedness
    # (it starts at ~0.9 cm error; anything runaway would exceed this).
    assert perr1 < 0.05, f"extrinsic position diverged: {perr1}"

    # Trajectory stays sane despite the calib errors.
    final_err = np.linalg.norm(np.asarray(outs.p[-1]) - np.asarray(sim.gt_p[-1]))
    assert final_err < 0.5, final_err
