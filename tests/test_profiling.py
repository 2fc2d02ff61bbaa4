"""Staged profiling runner (utils/profiling.py) emits the reference timing
CSV schema with sane values."""

import numpy as np

from ov_plane_tpu.eval.io import TIMING_COLUMNS
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config
from ov_plane_tpu.utils.profiling import run_sequence_profiled


def test_profiled_replay_matches_csv_schema(tmp_path):
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
    cfg.tpu.max_msckf_update = 16
    sim = build_sim(cfg, max_obs=48)
    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)

    rec = run_sequence_profiled(eng, state, bank, sim, cfg.tpu.max_imu_per_frame,
                                max_frames=8)
    assert len(rec.rows) == 8
    path = str(tmp_path / "timing.csv")
    rec.write(path)
    with open(path) as f:
        header = f.readline().strip().lstrip("# ").split(",")
    assert header == TIMING_COLUMNS
    data = np.loadtxt(path, delimiter=",", skiprows=1, ndmin=2)
    cols = {c: data[:, k] for k, c in enumerate(TIMING_COLUMNS)}
    assert (cols["total"] > 0).all()
    # Stages are a decomposition: total >= sum of the parts it brackets.
    parts = cols["propagation"] + cols["msckf update"] + cols["re-tri & marg"]
    assert (cols["total"] >= parts * 0.99).all()
    s = rec.summary()
    assert s["total"]["max"] >= s["total"]["mean"] > 0
