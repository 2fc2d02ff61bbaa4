"""PlaneTrackerBatch ≡ B independent PlaneTrackers, element for element.

The batched detector exists purely for host throughput (one [B, ...] numpy
pass instead of B sequential update() calls); its outputs must be EXACTLY
the per-stream trackers' — same plane ids, same memberships, same merge
records, same internal normal histories — across multi-frame sequences with
track churn, coplanar clusters, merges, and outlier rejection.
"""

import numpy as np

from ov_plane_tpu.frontend.plane_track import PlaneTracker
from ov_plane_tpu.frontend.plane_track_batch import PlaneTrackerBatch
from ov_plane_tpu.utils.config import TrackPlaneOptions


def _scene_frame(rng, n, t, drop_p=0.1):
    """A dominant floor plane (z=0) seen from above + sparse clutter, with
    track churn. uv is the camera projection of p3, so Delaunay neighbors
    are physical neighbors and within-plane triangles get clean normals."""
    ids = np.arange(1, n + 1)
    keep = rng.random(n) > drop_p
    ids = np.where(keep, ids, -1)
    g = rng.random(n) < 0.75
    # Fixed per-id layout (same rng consumption per frame keeps layouts
    # stable only per call — regenerate and let histories churn).
    xy = np.stack([np.cos(ids * 2.39), np.sin(ids * 1.17)], 1) * (0.3 + 0.6 * (ids[:, None] % 7) / 7)
    p3 = np.c_[xy, np.zeros(n)]
    p3[~g, 2] = 0.8 + 0.1 * (ids[~g] % 5)          # clutter floats above
    p3 += rng.normal(0, 0.003, p3.shape)
    cam_z = 3.0
    uv = 320 + 220 * (p3[:, :2] / (cam_z - p3[:, 2])[:, None]) * 3.0
    uv = uv + rng.normal(0, 0.5, (n, 2))
    valid = keep & (rng.random(n) > 0.05)
    R = np.eye(3)
    p_c = np.array([0.0, 0.0, cam_z])
    return ids.astype(np.int64), uv, p3, valid, R, p_c


def _assert_state_equal(bt: PlaneTrackerBatch, trs, s):
    tr = trs[s]
    np.testing.assert_array_equal(bt._ids[s], tr._ids)
    np.testing.assert_array_equal(bt._plane[s], tr._plane)
    np.testing.assert_array_equal(bt._hist_cnt[s], tr._hist_cnt)
    np.testing.assert_array_equal(bt._hist_ptr[s], tr._hist_ptr)
    np.testing.assert_allclose(bt._hist[s], tr._hist, atol=1e-12)
    assert int(bt.curr_plane_id[s]) == tr.curr_plane_id


def test_batch_tracker_matches_serial_trackers():
    B, N, T = 4, 48, 12
    opts = TrackPlaneOptions()
    opts.min_norms = 3
    opts.max_norm_avg_var = 30.0
    opts.max_norm_avg_max = 30.0
    bt = PlaneTrackerBatch(B, opts)
    trs = [PlaneTracker(opts) for _ in range(B)]

    rngs = [np.random.default_rng(100 + s) for s in range(B)]
    for t in range(T):
        frames = [_scene_frame(rngs[s], N, t) for s in range(B)]
        ids_b = np.stack([f[0] for f in frames])
        uv_b = np.stack([f[1] for f in frames])
        p3_b = np.stack([f[2] for f in frames])
        val_b = np.stack([f[3] for f in frames])
        R_b = np.stack([f[4] for f in frames])
        pc_b = np.stack([f[5] for f in frames])

        got = bt.update_batch(ids_b, uv_b, p3_b, val_b, R_b, pc_b)
        for s in range(B):
            f2p_ref, p2o_ref = trs[s].update(*frames[s])
            f2p, p2o = got[s]
            assert f2p == f2p_ref, (t, s, f2p, f2p_ref)
            assert p2o == p2o_ref, (t, s)
            _assert_state_equal(bt, trs, s)

    # The scenario genuinely exercised the machinery: planes were found.
    n_planes = sum(len(set(bt.feat_to_plane(s).values())) for s in range(B))
    assert n_planes >= max(2, B - 1), \
        "no planes clustered — scenario too weak to test parity"


def test_batch_tracker_degenerate_streams():
    """Streams with <3 valid tracks, all-invalid frames, and empty ids must
    take the early-return path identically."""
    B, N = 3, 16
    opts = TrackPlaneOptions()
    bt = PlaneTrackerBatch(B, opts)
    trs = [PlaneTracker(opts) for _ in range(B)]
    rng = np.random.default_rng(7)

    for t in range(4):
        frames = []
        for s in range(B):
            ids, uv, p3, valid, R, p_c = _scene_frame(rng, N, t)
            if s == 0:
                valid = valid & (np.arange(N) < 2)      # < 3 valid
            elif s == 1 and t % 2 == 0:
                ids = np.full(N, -1, np.int64)          # nothing tracked
            frames.append((ids, uv, p3, valid, R, p_c))
        got = bt.update_batch(
            np.stack([f[0] for f in frames]), np.stack([f[1] for f in frames]),
            np.stack([f[2] for f in frames]), np.stack([f[3] for f in frames]),
            np.stack([f[4] for f in frames]), np.stack([f[5] for f in frames]))
        for s in range(B):
            f2p_ref, p2o_ref = trs[s].update(*frames[s])
            assert got[s][0] == f2p_ref, (t, s)
            assert got[s][1] == p2o_ref, (t, s)
            _assert_state_equal(bt, trs, s)


def test_driver_batch_tracker_path_matches_serial_path(monkeypatch):
    """FusedVisionDriver with OVP_PLANE_BATCH=1 (default) must produce the
    same label/merge arrays and trajectories as OVP_PLANE_BATCH=0 on a
    plane-active batched replay (driver-level integration of the parity)."""
    import jax
    import jax.numpy as jnp

    from ov_plane_tpu.frontend.fused import FusedVisionDriver
    from ov_plane_tpu.frontend.synthetic import render_frame_textured
    from ov_plane_tpu.models.feature_bank import FeatureBank
    from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt
    from ov_plane_tpu.ops.quat import quat_2_rot
    from ov_plane_tpu.sim.simulator import build_sim, generate_planes
    from ov_plane_tpu.sim.trajectory import get_trajectory
    from ov_plane_tpu.utils.config import sim_config

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
    cfg.num_pts = 50
    cfg.num_pts_plane = 0
    cfg.cam_wh = [320, 240]
    cfg.cam_intrinsics = [150.0, 150.0, 160.0, 120.0, 0.0, 0.0, 0.0, 0.0]
    cfg.histogram_method = "NONE"
    cfg.tpu.max_features = 128
    cfg.tpu.max_obs_per_frame = 64
    cfg.tpu.max_msckf_update = 24
    cfg.msckf_options.sigma_pix = 2.0
    cfg.slam_options.sigma_pix = 2.0
    cfg.state.plane_init_min_feat = 8
    cfg.trackplane.min_norms = 3
    cfg.trackplane.max_norm_avg_var = 30.0
    cfg.trackplane.max_norm_avg_max = 30.0
    cfg.state.plane_init_max_cond = 150.0
    cfg.state.plane_msckf_max_cond = 150.0
    cfg.sim.min_feature_gen_distance = 1.0
    sim = build_sim(cfg, max_obs=64)
    _, traj_pos, _ = get_trajectory(cfg.sim)
    planes = generate_planes(traj_pos, cfg.sim.min_feature_gen_distance)

    eng = VioEngine.from_config(cfg)
    state0 = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0],
        v0=sim.gt_v[0], bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0])
    bank0 = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    R_ItoC = np.asarray(quat_2_rot(np.asarray(cfg.cam_extrinsics[0:4])))
    p_IinC = np.asarray(cfg.cam_extrinsics[4:7])
    zeta = np.asarray(cfg.cam_intrinsics)
    feat_p = np.asarray(sim.feat_p)
    imu_t, imu_w, imu_a = map(np.asarray, (sim.imu_t, sim.imu_w, sim.imu_a))
    W = cfg.tpu.max_imu_per_frame
    B = 2
    n = min(30, sim.cam_t_imu.shape[0] - 1)
    frames = []
    for i in range(1, n + 1):
        R_GtoI = np.asarray(quat_2_rot(sim.gt_q[i]))
        frames.append(render_frame_textured(
            planes.corners, planes.normal, planes.d, feat_p, R_GtoI,
            np.asarray(sim.gt_p[i]), R_ItoC, p_IinC, zeta, cfg.cam_wh,
            texture_cell=0.1, speckle_cells=((0.05, 0.12, 0.30), 0.12),
            blobs=False))

    def run(batch_flag):
        monkeypatch.setenv("OVP_PLANE_BATCH", batch_flag)
        drv = FusedVisionDriver(cfg, eng, batch=B)
        assert (drv.batch_tracker is not None) == (batch_flag == "1")
        fev = drv.init_frontend()
        st = jax.tree.map(lambda x: jnp.stack([x] * B), state0)
        bk = jax.tree.map(lambda x: jnp.stack([x] * B), bank0)
        fe = jax.tree.map(lambda x: jnp.stack([x] * B), fev)
        labels, counters = [], np.zeros(9)
        for i in range(1, n + 1):
            s0 = int(sim.imu_window_start[i])
            it = np.full(W, np.inf)
            iw = np.zeros((W, 3))
            ia = np.zeros((W, 3))
            m = len(imu_t[s0:s0 + W])
            it[:m], iw[:m], ia[:m] = (imu_t[s0:s0 + W], imu_w[s0:s0 + W],
                                      imu_a[s0:s0 + W])
            st, bk, fe, out = drv.step_batch(
                st, bk, fe, np.stack([frames[i - 1]] * B),
                np.tile(it, (B, 1)), np.tile(iw, (B, 1, 1)),
                np.tile(ia, (B, 1, 1)),
                np.full(B, float(sim.cam_t_imu[i])))
            labels.append((drv._label_ids.copy(), drv._label_pid.copy(),
                           drv._merge_from.copy(), drv._merge_into.copy()))
            counters = counters + drv.last_counters.sum(axis=0)
        drv.flush_stream()
        return np.asarray(out.p), labels, counters

    p_ser, lab_ser, cnt_ser = run("0")
    p_bat, lab_bat, cnt_bat = run("1")
    np.testing.assert_array_equal(p_bat, p_ser)
    for (a, b) in zip(lab_bat, lab_ser):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    np.testing.assert_array_equal(cnt_bat, cnt_ser)
    # The replay genuinely exercised plane labels (host detector produced
    # associations that reached the driver arrays).
    assert any((la[0] >= 0).any() for la in lab_bat), "no plane labels fired"
