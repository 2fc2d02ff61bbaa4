"""Full vision-pipeline e2e: synthetic images → KLT/FAST frontend → filter
(BASELINE.json config-3 analogue, self-contained). Slowest test — small scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.frontend.pipeline import VisionPipeline
from ov_plane_tpu.frontend.synthetic import render_frame
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, step
from ov_plane_tpu.ops.quat import quat_2_rot
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config


@pytest.mark.slow
def test_vision_pipeline_tracks_and_filters():
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
    cfg.histogram_method = "NONE"  # synthetic frames are already well-exposed
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
    pipe = VisionPipeline(cfg, eng)

    R_ItoC = np.asarray(quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4])))
    p_IinC = np.asarray(cfg.cam_extrinsics[4:7])
    zeta = np.asarray(cfg.cam_intrinsics)
    feat_p = np.asarray(sim.feat_p)

    imu_t = np.asarray(sim.imu_t)
    imu_w = np.asarray(sim.imu_w)
    imu_a = np.asarray(sim.imu_a)

    n_frames = min(25, sim.cam_t_imu.shape[0] - 1)
    errs = []
    tracked_counts = []
    for i in range(1, n_frames + 1):
        R_GtoI = np.asarray(quat_2_rot(sim.gt_q[i]))
        p_IinG = np.asarray(sim.gt_p[i])
        img = render_frame(feat_p, R_GtoI, p_IinG, R_ItoC, p_IinC, zeta, cfg.cam_wh)
        obs = pipe.process_image(img, state, bank)
        start = int(sim.imu_window_start[i])
        end = min(start + cfg.tpu.max_imu_per_frame, len(imu_t))
        frame = pipe.make_frame(obs, imu_t[start:end], imu_w[start:end], imu_a[start:end],
                                float(sim.cam_t_imu[i]))
        state, bank, out = step(eng, state, bank, frame)
        errs.append(float(jnp.linalg.norm(out.p - sim.gt_p[i])))
        tracked_counts.append(int(jnp.sum(obs[0] >= 0)))

    # The frontend must actually track.
    assert np.mean(tracked_counts[2:]) > 15, tracked_counts
    # The filter should stay bounded near ground truth (cm-dm level at this
    # scale; pure IMU would drift much further).
    assert errs[-1] < 0.5, errs[-5:]
    assert np.max(errs) < 1.0, np.max(errs)


@pytest.mark.slow
def test_vision_pipeline_with_plane_detection():
    """Full plane-aided stack from images: KLT/FAST on the raycast-textured
    room -> Delaunay plane detection -> CP plane states + point-on-plane
    constraints in the filter (config-3 + planes).

    The scene is the realistic close-range regime (0.7-2 m walls, 20 Hz
    camera, world-anchored speckle texture, no artificial blob overlays) and
    process_image gets the IMU window, so the full predicted-pose LK prior +
    gyro RANSAC run — the configuration where image-driven CP plane
    initialization actually fires (reference loop: TrackPlane.cpp:580-1121 →
    UpdaterPlane.cpp:61-481)."""
    cfg = sim_config()
    cfg.sim.traj_duration = 6.0
    cfg.sim.freq_cam = 20.0
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = True
    cfg.state.use_plane_slam_feats = True
    cfg.state.plane_init_min_feat = 8
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 15
    cfg.num_pts_plane = 40
    cfg.cam_wh = [640, 480]
    cfg.cam_intrinsics = [300.0, 300.0, 320.0, 240.0, 0.0, 0.0, 0.0, 0.0]
    cfg.histogram_method = "NONE"  # synthetic frames are already well-exposed
    cfg.tpu.max_features = 128
    cfg.tpu.max_obs_per_frame = 64
    cfg.tpu.max_msckf_update = 24
    cfg.trackplane.min_norms = 3
    cfg.trackplane.max_norm_avg_var = 30.0
    cfg.trackplane.max_norm_avg_max = 30.0
    cfg.msckf_options.chi2_multipler = 5.0  # vision tracks need outlier gating
    # The plane-fit cond gate acts on raw GLOBAL coordinates, so it scales
    # with |scene origin offset| / cluster spread — this room orbits 1-2 m
    # from the origin and healthy wall clusters measure cond 40-260 (the
    # reference's 50 was tuned for its table-origin scenes). Same override
    # as run_euroc --sim-calib --use-planes.
    cfg.state.plane_init_max_cond = 150.0
    cfg.state.plane_msckf_max_cond = 150.0
    cfg.sim.min_feature_gen_distance = 0.7
    cfg.sim.max_feature_gen_distance = 2.0
    sim = build_sim(cfg, max_obs=64)

    from ov_plane_tpu.frontend.synthetic import render_frame_textured
    from ov_plane_tpu.sim.simulator import generate_planes
    from ov_plane_tpu.sim.trajectory import get_trajectory

    _, traj_pos, _ = get_trajectory(cfg.sim)
    planes = generate_planes(traj_pos, cfg.sim.min_feature_gen_distance)

    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    pipe = VisionPipeline(cfg, eng)

    R_ItoC = np.asarray(quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4])))
    p_IinC = np.asarray(cfg.cam_extrinsics[4:7])
    zeta = np.asarray(cfg.cam_intrinsics)
    feat_p = np.asarray(sim.feat_p)
    imu_t = np.asarray(sim.imu_t)
    imu_w = np.asarray(sim.imu_w)
    imu_a = np.asarray(sim.imu_a)

    n_frames = min(85, sim.cam_t_imu.shape[0] - 1)
    n_plane_assoc = 0
    n_plane_init = 0
    n_plane_constraints = 0
    max_planes = 0
    for i in range(1, n_frames + 1):
        R_GtoI = np.asarray(quat_2_rot(sim.gt_q[i]))
        p_IinG = np.asarray(sim.gt_p[i])
        img = render_frame_textured(planes.corners, planes.normal, planes.d,
                                    feat_p, R_GtoI, p_IinG, R_ItoC, p_IinC,
                                    zeta, cfg.cam_wh, blobs=False)
        start = int(sim.imu_window_start[i])
        end = min(start + cfg.tpu.max_imu_per_frame, len(imu_t))
        obs = pipe.process_image(img, state, bank,
                                 imu_t=imu_t[start:end], imu_w=imu_w[start:end],
                                 t_new=float(sim.cam_t_imu[i]))
        n_plane_assoc += int(jnp.sum(obs[2] >= 0))
        frame = pipe.make_frame(obs, imu_t[start:end], imu_w[start:end], imu_a[start:end],
                                float(sim.cam_t_imu[i]))
        state, bank, out = step(eng, state, bank, frame)
        n_plane_init += int(out.n_plane_init)
        n_plane_constraints += int(out.n_plane_constraints)
        max_planes = max(max_planes, int(out.n_planes))
        err = float(jnp.linalg.norm(out.p - sim.gt_p[i]))
        assert err < 1.5, (i, err)

    # The image-based plane frontend must produce plane associations, and the
    # full loop must complete: a CP plane state initialized from imagery and
    # point-on-plane constraint updates applied by the filter.
    assert n_plane_assoc > 0, "no image-based plane associations produced"
    assert n_plane_init >= 1, "image-driven CP plane init never fired"
    assert max_planes >= 1, "no CP plane state ever active"
    assert n_plane_constraints > 0, "no plane constraint updates applied"
