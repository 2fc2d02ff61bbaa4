"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §7.4):
sharded information-form compression must match the single-device QR path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ov_plane_tpu.ops import ekf
from ov_plane_tpu.parallel import schur

N_DEV = len(jax.devices())


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple devices")
def test_sharded_compress_matches_single_device():
    rng = np.random.default_rng(2)
    D = 24
    rows_per_shard = 16
    H = rng.normal(size=(N_DEV * rows_per_shard, D))
    r = rng.normal(size=(N_DEV * rows_per_shard,))
    # Zero some rows (mask-safety).
    H[5] = 0
    r[5] = 0

    mesh = Mesh(np.array(jax.devices()), axis_names=("shard",))

    @jax.jit
    def run(Hs, rs):
        f = shard_map(
            lambda h, x: schur.sharded_compress(h, x[:, 0], "shard"),
            mesh=mesh,
            in_specs=(P("shard", None), P("shard", None)),
            out_specs=(P(), P()),
        )
        return f(Hs, rs)

    R_sh, y_sh = run(jnp.asarray(H), jnp.asarray(r)[:, None])

    # Single-device oracle: information equivalence with the QR compression.
    Hc, rc = ekf.measurement_compress(jnp.asarray(H), jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(R_sh.T @ R_sh), np.asarray(Hc.T @ Hc), atol=1e-8)
    np.testing.assert_allclose(np.asarray(R_sh.T @ y_sh), np.asarray(Hc.T @ rc), atol=1e-8)

    # And the Kalman update using (R, y) must equal the update using (H, r).
    P0 = rng.normal(size=(D, D))
    P0 = P0 @ P0.T + D * np.eye(D)
    dx1, P1, _ = ekf.kalman_update(jnp.asarray(P0), jnp.asarray(H), jnp.asarray(r), jnp.ones(H.shape[0]))
    dx2, P2, _ = ekf.kalman_update(jnp.asarray(P0), R_sh, y_sh, jnp.ones(D))
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=1e-7)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-7)


def test_information_roundtrip_zero_rows():
    """All-masked shard contributes nothing and stays finite."""
    D = 8
    lam, eta = schur.local_information(jnp.zeros((4, D)), jnp.zeros(4))
    R, y = schur.information_to_compressed(lam, eta)
    assert np.all(np.isfinite(np.asarray(R)))
    assert np.all(np.isfinite(np.asarray(y)))
    np.testing.assert_allclose(np.asarray(R.T @ y), np.zeros(D), atol=1e-12)


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple devices")
def test_batched_replay_runs_on_mesh():
    """Smoke: a tiny batched replay over the mesh produces finite outputs."""
    from ov_plane_tpu.models.feature_bank import FeatureBank
    from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt
    from ov_plane_tpu.parallel.replay import batched_replay, make_mesh, replicate, shard_leading_axis
    from ov_plane_tpu.sim.simulator import build_sim
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.sim.traj_duration = 6.0
    cfg.state.max_slam_features = 0
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 20
    cfg.num_pts_plane = 0
    cfg.tpu.max_features = 64
    cfg.tpu.max_obs_per_frame = 48
    cfg.tpu.max_msckf_update = 24
    sim = build_sim(cfg, max_obs=48)

    eng = VioEngine.from_config(cfg)
    B = N_DEV
    st = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bk = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    states_b = jax.tree.map(lambda x: jnp.stack([x] * B), st)
    banks_b = jax.tree.map(lambda x: jnp.stack([x] * B), bk)

    mesh = make_mesh()
    states_b = shard_leading_axis(states_b, mesh)
    banks_b = shard_leading_axis(banks_b, mesh)
    sim_r = replicate(sim, mesh)

    outs, fleet_rmse = batched_replay(eng, states_b, banks_b, sim_r, cfg.tpu.max_imu_per_frame, mesh)
    assert np.isfinite(float(fleet_rmse))
    assert float(fleet_rmse) < 1.0
    # All batch members identical (same stream, same init).
    np.testing.assert_allclose(np.asarray(outs.p[0]), np.asarray(outs.p[-1]), atol=1e-12)


def test_inloop_sharded_compression_matches_unsharded():
    """In-loop sharded Schur reduction (MsckfOptions.shard_axis): the full
    sequence replay under a (dp x sp) mesh with measurement rows sharded over
    'sp' matches the single-device info-compression replay to float64
    precision — GSPMD partitions the gram reduction and inserts the psum."""
    from ov_plane_tpu.models.feature_bank import FeatureBank
    from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
    from ov_plane_tpu.sim.simulator import build_sim
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.sim.traj_duration = 5.0
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 20
    cfg.num_pts_plane = 0
    cfg.tpu.max_features = 64
    cfg.tpu.max_obs_per_frame = 48
    cfg.tpu.max_msckf_update = 24
    cfg.tpu.use_info_compression = True
    sim = build_sim(cfg, max_obs=48)

    def run(cfg_run):
        eng = VioEngine.from_config(cfg_run)
        st = init_state_with_gt(
            eng, cfg_run, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0],
            v0=sim.gt_v[0], bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0])
        bk = FeatureBank.create(cfg_run.tpu.max_features, eng.layout.max_clones)
        _, _, outs = run_sequence(eng, st, bk, sim, imu_window=cfg_run.tpu.max_imu_per_frame)
        return np.asarray(outs.p)

    p_ref = run(cfg)

    cfg.tpu.shard_axis = "sp"
    from jax.sharding import AxisType
    mesh = jax.make_mesh((N_DEV // 2, 2), ("dp", "sp"),
                         axis_types=(AxisType.Auto, AxisType.Auto))
    with jax.set_mesh(mesh):
        p_sharded = run(cfg)

    assert np.isfinite(p_sharded).all()
    np.testing.assert_allclose(p_sharded, p_ref, atol=1e-8)


def test_inloop_sharded_plane_replay_matches_unsharded():
    """Plane-active coverage under the mesh (VERDICT round-2 weak #4): the
    FULL plane machinery — delayed CP init, grouped out-of-state plane
    updates, in-state plane rows, unseen-plane marginalization — replayed
    under a (dp x sp) mesh with sharded measurement rows must match the
    single-device replay, and the plane paths must actually fire."""
    from ov_plane_tpu.models.feature_bank import FeatureBank
    from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
    from ov_plane_tpu.sim.simulator import build_sim
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.sim.traj_duration = 6.0
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = True
    cfg.state.use_plane_slam_feats = True
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 12
    cfg.num_pts_plane = 30
    cfg.tpu.max_features = 96
    cfg.tpu.max_obs_per_frame = 64
    cfg.tpu.max_msckf_update = 32
    cfg.tpu.use_info_compression = True
    sim = build_sim(cfg, max_obs=64)

    def run(cfg_run):
        eng = VioEngine.from_config(cfg_run)
        st = init_state_with_gt(
            eng, cfg_run, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0],
            v0=sim.gt_v[0], bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0])
        bk = FeatureBank.create(cfg_run.tpu.max_features, eng.layout.max_clones)
        _, _, outs = run_sequence(eng, st, bk, sim, imu_window=cfg_run.tpu.max_imu_per_frame)
        return outs

    outs_ref = run(cfg)
    # The plane machinery genuinely ran in this replay.
    assert int(np.sum(np.asarray(outs_ref.n_plane_init))) >= 1
    assert int(np.sum(np.asarray(outs_ref.n_plane_constraints))) > 0
    assert int(np.max(np.asarray(outs_ref.n_planes))) >= 1

    cfg.tpu.shard_axis = "sp"
    from jax.sharding import AxisType
    mesh = jax.make_mesh((N_DEV // 2, 2), ("dp", "sp"),
                         axis_types=(AxisType.Auto, AxisType.Auto))
    with jax.set_mesh(mesh):
        outs_sh = run(cfg)

    p_ref, p_sh = np.asarray(outs_ref.p), np.asarray(outs_sh.p)
    assert np.isfinite(p_sh).all()
    np.testing.assert_allclose(p_sh, p_ref, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(outs_sh.n_plane_init), np.asarray(outs_ref.n_plane_init))
    np.testing.assert_array_equal(np.asarray(outs_sh.n_plane_constraints),
                                  np.asarray(outs_ref.n_plane_constraints))
    np.testing.assert_array_equal(np.asarray(outs_sh.n_planes), np.asarray(outs_ref.n_planes))


def test_plane_replay_info_compression_matches_qr():
    """The info-form compress in the PLANE paths (ekf.info_compress_rows —
    gram+Cholesky producing exactly thin-QR's R factor) must replay the
    plane-active sequence equivalently to the QR form (round-4 TPU-latency
    lever; the classic path's equivalence was validated in round 2)."""
    from ov_plane_tpu.models.feature_bank import FeatureBank
    from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
    from ov_plane_tpu.sim.simulator import build_sim
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.sim.traj_duration = 6.0
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = True
    cfg.state.use_plane_slam_feats = True
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 12
    cfg.num_pts_plane = 30
    cfg.tpu.max_features = 96
    cfg.tpu.max_obs_per_frame = 64
    cfg.tpu.max_msckf_update = 32
    sim = build_sim(cfg, max_obs=64)

    def run(use_info):
        cfg.tpu.use_info_compression = use_info
        eng = VioEngine.from_config(cfg)
        st = init_state_with_gt(
            eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0],
            v0=sim.gt_v[0], bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0])
        bk = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
        _, _, outs = run_sequence(eng, st, bk, sim, imu_window=cfg.tpu.max_imu_per_frame)
        return outs

    outs_qr = run(False)
    outs_in = run(True)
    # Plane machinery genuinely fired in the QR arm.
    assert int(np.sum(np.asarray(outs_qr.n_plane_init))) >= 1
    assert int(np.sum(np.asarray(outs_qr.n_plane_constraints))) > 0
    # Same discrete decisions, same trajectories (the R factors are equal up
    # to FP: gram+chol squares the condition, so f64 agreement is ~1e-7 here,
    # not bitwise).
    np.testing.assert_array_equal(np.asarray(outs_in.n_plane_init),
                                  np.asarray(outs_qr.n_plane_init))
    np.testing.assert_array_equal(np.asarray(outs_in.n_plane_constraints),
                                  np.asarray(outs_qr.n_plane_constraints))
    np.testing.assert_allclose(np.asarray(outs_in.p), np.asarray(outs_qr.p),
                               atol=5e-5)
