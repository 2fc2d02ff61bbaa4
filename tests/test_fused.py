"""Fused one-dispatch vision step (frontend/fused.py): the whole frontend +
filter frame as a single jitted program, driven single-stream and vmapped
over a stream batch."""

import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.frontend.fused import FusedVisionDriver
from ov_plane_tpu.frontend.synthetic import render_frame
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt
from ov_plane_tpu.ops.quat import quat_2_rot
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config


def _setup():
    cfg = sim_config()
    cfg.sim.traj_duration = 6.0
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 40
    cfg.num_pts_plane = 0
    cfg.cam_wh = [320, 240]
    cfg.cam_intrinsics = [200.0, 200.0, 160.0, 120.0, 0.0, 0.0, 0.0, 0.0]
    cfg.histogram_method = "NONE"
    cfg.tpu.max_features = 128
    cfg.tpu.max_obs_per_frame = 64
    cfg.tpu.max_msckf_update = 24
    sim = build_sim(cfg, max_obs=64)
    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    R_ItoC = np.asarray(quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4])))
    p_IinC = np.asarray(cfg.cam_extrinsics[4:7])
    zeta = np.asarray(cfg.cam_intrinsics)
    feat_p = np.asarray(sim.feat_p)
    n = min(22, sim.cam_t_imu.shape[0] - 1)
    frames = [
        render_frame(feat_p, np.asarray(quat_2_rot(sim.gt_q[i])), np.asarray(sim.gt_p[i]),
                     R_ItoC, p_IinC, zeta, cfg.cam_wh)
        for i in range(1, n + 1)
    ]
    return cfg, eng, state, bank, sim, frames, n


def _imu_window(cfg, sim, i):
    W = cfg.tpu.max_imu_per_frame
    imu_t, imu_w, imu_a = map(np.asarray, (sim.imu_t, sim.imu_w, sim.imu_a))
    s0 = int(sim.imu_window_start[i])
    it = np.full(W, np.inf)
    iw = np.zeros((W, 3))
    ia = np.zeros((W, 3))
    m = len(imu_t[s0:s0 + W])
    it[:m] = imu_t[s0:s0 + W]
    iw[:m] = imu_w[s0:s0 + W]
    ia[:m] = imu_a[s0:s0 + W]
    return it, iw, ia


@pytest.mark.slow
def test_fused_vision_tracks_and_filters():
    cfg, eng, state, bank, sim, frames, n = _setup()
    drv = FusedVisionDriver(cfg, eng)
    fev = drv.init_frontend()
    errs, tracked = [], []
    for i in range(1, n + 1):
        it, iw, ia = _imu_window(cfg, sim, i)
        state, bank, fev, out = drv.step_stream(
            state, bank, fev, frames[i - 1], it, iw, ia, float(sim.cam_t_imu[i]))
        errs.append(float(jnp.linalg.norm(out.p - sim.gt_p[i])))
        tracked.append(int(np.sum(np.asarray(fev.valid))))
    assert np.mean(tracked[2:]) > 15, tracked
    assert errs[-1] < 0.5, errs[-5:]
    assert np.max(errs) < 1.0, np.max(errs)


@pytest.mark.slow
def test_fused_batch_matches_itself_and_stays_bounded():
    """vmapped stream batch: identical streams stay identical members, and
    the batched driver's filters stay bounded (the batched vision replay —
    VERDICT round-2 item 3)."""
    import jax

    cfg, eng, state, bank, sim, frames, n = _setup()
    B = 2
    drv = FusedVisionDriver(cfg, eng, batch=B)
    fev = drv.init_frontend()
    states = jax.tree.map(lambda x: jnp.stack([x] * B), state)
    banks = jax.tree.map(lambda x: jnp.stack([x] * B), bank)
    fevs = jax.tree.map(lambda x: jnp.stack([x] * B), fev)
    for i in range(1, n + 1):
        it, iw, ia = _imu_window(cfg, sim, i)
        states, banks, fevs, out = drv.step_batch(
            states, banks, fevs, np.stack([frames[i - 1]] * B),
            np.tile(it, (B, 1)), np.tile(iw, (B, 1, 1)), np.tile(ia, (B, 1, 1)),
            np.full(B, float(sim.cam_t_imu[i])))
    p = np.asarray(out.p)
    np.testing.assert_allclose(p[0], p[1], atol=1e-12)
    err = np.linalg.norm(p[0] - np.asarray(sim.gt_p[n]))
    assert err < 0.5, err
    assert np.mean([int(v) for v in np.sum(np.asarray(fevs.valid), axis=1)]) > 15
