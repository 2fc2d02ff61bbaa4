"""End-to-end simulated VIO regression (BASELINE.json config 1, small scale).

The reference's primary quality gate is "run the simulator end-to-end and
check RMSE/NEES" (SURVEY.md §4); this is the same gate in miniature.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.eval.metrics import rmse_nees
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config


@pytest.fixture(scope="module")
def sim_and_cfg():
    cfg = sim_config()
    cfg.sim.traj_duration = 10.0
    cfg.state.max_slam_features = 0
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 40
    cfg.num_pts_plane = 0
    cfg.tpu.max_features = 128
    cfg.tpu.max_obs_per_frame = 80
    sim = build_sim(cfg, max_obs=cfg.tpu.max_obs_per_frame)
    return sim, cfg


def test_point_msckf_sim_consistency(sim_and_cfg):
    sim, cfg = sim_and_cfg
    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    state, bank, outs = run_sequence(eng, state, bank, sim, imu_window=cfg.tpu.max_imu_per_frame)

    m = rmse_nees(
        outs.q, outs.p, outs.cov_diag_imu[:, 0:3], outs.cov_diag_imu[:, 3:6],
        sim.gt_q[1:], sim.gt_p[1:],
    )
    rmse_pos = float(m["rmse_pos"])
    rmse_ori = float(m["rmse_ori_deg"])
    nees_ori = float(m["nees_ori"])
    nees_pos = float(m["nees_pos"])
    # Healthy filter: centimeter-level position, sub-degree orientation,
    # NEES within a loose consistency band around dim=3.
    assert rmse_pos < 0.20, f"position RMSE {rmse_pos}"
    assert rmse_ori < 2.0, f"orientation RMSE {rmse_ori}"
    assert 0.05 < nees_ori < 12.0, f"orientation NEES {nees_ori}"
    assert 0.05 < nees_pos < 12.0, f"position NEES {nees_pos}"
    # The filter must actually be using measurements.
    assert int(jnp.sum(outs.n_msckf_used)) > 50
    # Covariance stays SPD (diagonals positive).
    assert float(jnp.min(outs.cov_diag_imu)) > 0.0


def test_msckf_update_improves_over_dead_reckoning(sim_and_cfg):
    sim, cfg = sim_and_cfg
    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    _, _, outs = run_sequence(eng, state, bank, sim, imu_window=cfg.tpu.max_imu_per_frame)

    # Dead-reckoning baseline: same engine, but no usable observations.
    sim_dr = sim._replace(obs_id=jnp.full_like(sim.obs_id, -1))
    state2 = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank2 = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    _, _, outs_dr = run_sequence(eng, state2, bank2, sim_dr, imu_window=cfg.tpu.max_imu_per_frame)

    err = float(jnp.linalg.norm(outs.p[-1] - sim.gt_p[-1]))
    err_dr = float(jnp.linalg.norm(outs_dr.p[-1] - sim.gt_p[-1]))
    assert err < 0.5 * err_dr, f"vision should beat dead reckoning: {err} vs {err_dr}"


def test_slow_scan_trajectory_finite_kinematics():
    """traj_kind slow_scan (time-dilated room scan): the near-static motion
    regime must yield finite spline kinematics end-to-end — regression for
    the NaN-at-zero-twist jvp bug (exp_so3 tangents at w=0)."""
    import numpy as np

    from ov_plane_tpu.sim.simulator import build_sim
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.sim.traj_duration = 8.0
    cfg.sim.traj_kind = "slow_scan"
    sim = build_sim(cfg, max_obs=48)
    for name in ("gt_v", "gt_p", "gt_q", "imu_w", "imu_a"):
        arr = np.asarray(getattr(sim, name))
        assert np.isfinite(arr).all(), name
    # Genuinely slower than the default scan: small velocities.
    assert np.abs(np.asarray(sim.gt_v)).max() < 0.6
