"""Fused one-dispatch vision step WITH planes: the packed-upload / packed-pull
pipelined driver must carry plane labels host→device (2-frame lag) all the way
to CP plane init + point-on-plane constraints — on the tabletop scene under
the reference's STOCK plane gates (no protocol overrides).

Covers the round-3 driver dataflow end-to-end: _pack_inputs → device unpack →
fused step → packed pull → host Delaunay detection → labels next dispatch.
Reference loop: TrackPlane.cpp:580-1121 → UpdaterPlane.cpp:61-481.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.frontend.fused import FusedVisionDriver
from ov_plane_tpu.frontend.synthetic import render_frame_textured
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt
from ov_plane_tpu.ops.quat import quat_2_rot
from ov_plane_tpu.sim.simulator import build_sim, generate_planes
from ov_plane_tpu.sim.trajectory import get_trajectory
from ov_plane_tpu.utils.config import sim_config


@pytest.mark.slow
def test_fused_tabletop_planes_stock_gates():
    cfg = sim_config()
    cfg.sim.traj_duration = 6.0
    cfg.sim.freq_cam = 20.0
    cfg.sim.traj_kind = "tabletop"
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = True
    cfg.state.use_plane_slam_feats = True
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    # STOCK plane gates: plane_init_min_feat 10, cond <= 50, min_norms 5,
    # avg-norm var/max 20 — exactly the reference defaults (config/rpng_plane).
    cfg.num_pts = 50
    cfg.num_pts_plane = 0
    cfg.cam_wh = [640, 480]
    cfg.cam_intrinsics = [300.0, 300.0, 320.0, 240.0, 0.0, 0.0, 0.0, 0.0]
    cfg.histogram_method = "NONE"
    cfg.tpu.max_features = 128
    cfg.tpu.max_obs_per_frame = 64
    cfg.tpu.max_msckf_update = 24
    # Renderer-noise whitening (calibration fact, applied by run_euroc
    # --sim-calib too): synthetic KLT noise is ~1.5-2 px.
    cfg.msckf_options.sigma_pix = 2.0
    cfg.slam_options.sigma_pix = 2.0
    cfg.sim.min_feature_gen_distance = 1.0
    sim = build_sim(cfg, max_obs=64)

    _, traj_pos, _ = get_trajectory(cfg.sim)
    planes = generate_planes(traj_pos, cfg.sim.min_feature_gen_distance)

    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    drv = FusedVisionDriver(cfg, eng)
    fev = drv.init_frontend()

    R_ItoC = np.asarray(quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4])))
    p_IinC = np.asarray(cfg.cam_extrinsics[4:7])
    zeta = np.asarray(cfg.cam_intrinsics)
    feat_p = np.asarray(sim.feat_p)
    imu_t, imu_w, imu_a = map(np.asarray, (sim.imu_t, sim.imu_w, sim.imu_a))
    W = cfg.tpu.max_imu_per_frame

    n_frames = min(85, sim.cam_t_imu.shape[0] - 1)
    n_init = n_constr = max_planes = 0
    labels_seen = 0
    for i in range(1, n_frames + 1):
        R_GtoI = np.asarray(quat_2_rot(sim.gt_q[i]))
        img = render_frame_textured(
            planes.corners, planes.normal, planes.d, feat_p, R_GtoI,
            np.asarray(sim.gt_p[i]), R_ItoC, p_IinC, zeta, cfg.cam_wh,
            texture_cell=0.1, speckle_cells=((0.05, 0.12, 0.30), 0.12),
            blobs=False)
        s0 = int(sim.imu_window_start[i])
        it = np.full(W, np.inf)
        iw = np.zeros((W, 3))
        ia = np.zeros((W, 3))
        m = len(imu_t[s0:s0 + W])
        it[:m], iw[:m], ia[:m] = imu_t[s0:s0 + W], imu_w[s0:s0 + W], imu_a[s0:s0 + W]
        state, bank, fev, out = drv.step_stream(
            state, bank, fev, img, it, iw, ia, float(sim.cam_t_imu[i]))
        cnt = drv.last_counters
        n_init += int(cnt[:, 0].sum())
        n_constr += int(cnt[:, 1].sum())
        max_planes = max(max_planes, int(cnt[:, 2].max()))
        labels_seen += int(np.sum(drv._label_ids[0] >= 0))
        err = float(jnp.linalg.norm(out.p - sim.gt_p[i]))
        assert err < 1.5, (i, err)
    drv.flush_stream()

    # Host plane detection produced labels, the pipelined driver carried them
    # into the device program, and the filter completed the plane loop.
    assert labels_seen > 0, "host plane labels never reached the driver arrays"
    assert n_init >= 1, "image-driven CP plane init never fired (stock gates)"
    assert max_planes >= 1, "no CP plane state ever active"
    assert n_constr > 0, "no plane constraint updates applied"
