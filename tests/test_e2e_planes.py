"""End-to-end plane-aided VIO regression (BASELINE.json config 2, small scale):
CP plane states + point-on-plane constraints must improve over point-only."""

import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.eval.metrics import rmse_nees
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config


def _cfg(use_planes: bool):
    cfg = sim_config()
    cfg.sim.traj_duration = 10.0
    # No SLAM landmarks: isolates the benefit of the plane constraints.
    cfg.state.max_slam_features = 0
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.state.use_plane_constraint = use_planes
    cfg.state.use_plane_slam_feats = use_planes
    cfg.num_pts = 20
    cfg.num_pts_plane = 35
    cfg.tpu.max_features = 144
    cfg.tpu.max_obs_per_frame = 96
    cfg.tpu.max_msckf_update = 40
    return cfg


@pytest.fixture(scope="module")
def sim():
    return build_sim(_cfg(True), max_obs=96)


def _run(cfg, sim):
    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    state, bank, outs = run_sequence(eng, state, bank, sim, imu_window=cfg.tpu.max_imu_per_frame)
    m = rmse_nees(outs.q, outs.p, outs.cov_diag_imu[:, 0:3], outs.cov_diag_imu[:, 3:6],
                  sim.gt_q[1:], sim.gt_p[1:])
    return state, outs, {k: float(v) for k, v in m.items()}


def test_plane_vio_beats_point_only(sim):
    state_pl, outs_pl, m_pl = _run(_cfg(True), sim)
    _, _, m_pt = _run(_cfg(False), sim)

    # Plane run stays consistent and accurate.
    assert m_pl["rmse_pos"] < 0.15, m_pl
    assert 0.02 < m_pl["nees_ori"] < 12.0, m_pl
    # Plane states were created and survive.
    assert int(jnp.sum(state_pl.plane_active)) >= 1
    # The constraint-update counter (reference CSV column) actually counts.
    assert int(jnp.sum(outs_pl.n_plane_constraints)) > 0
    # Plane constraints should not make things worse (usually much better).
    assert m_pl["rmse_pos"] <= 1.2 * m_pt["rmse_pos"], (m_pl, m_pt)

    # Recovered CP planes match a true sim plane (id mapping: sim plane ids).
    cp_est = np.asarray(state_pl.plane_cp)[np.asarray(state_pl.plane_active)]
    cp_true = np.asarray(sim.plane_cp)
    for cp in cp_est:
        dists = np.linalg.norm(cp_true - cp, axis=1)
        assert dists.min() < 0.10, (cp, cp_true)


def test_use_groundtruths_injection(sim):
    """Ground-truth injection (the reference's estimator-isolation lever,
    UpdaterMSCKF.cpp:284-302) runs the filter on true feature/plane values:
    it must stay accurate and consistent — validating the EKF machinery
    independently of triangulation/plane-fit errors (SURVEY.md §4)."""
    cfg_gt = _cfg(True)
    cfg_gt.state.use_groundtruths = True
    _, _, m_gt = _run(cfg_gt, sim)
    assert m_gt["rmse_pos"] < 0.05, m_gt
    assert m_gt["rmse_ori_deg"] < 1.0, m_gt
    assert 0.01 < m_gt["nees_ori"] < 12.0, m_gt
