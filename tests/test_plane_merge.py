"""Tests for plane-id merging (StateHelper::merge_planes_and_marginalize)."""

import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.models.plane_init import merge_planes
from ov_plane_tpu.state.layout import StateLayout
from ov_plane_tpu.state.vio_state import VioState

LAY = StateLayout(max_clones=3, max_slam=2, max_planes=3)


def _state_with_planes():
    st = VioState.create(LAY)
    cov = np.eye(LAY.dim) * 1e-2
    st = st.replace(cov=jnp.asarray(cov))
    st = st.replace(
        plane_cp=jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.01, 2.01], [1.0, 0.0, 0.0]]),
        plane_cp_fej=jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.01, 2.01], [1.0, 0.0, 0.0]]),
        plane_id=jnp.asarray([5, 9, 7], jnp.int32),
        plane_active=jnp.asarray([True, True, True]),
    )
    return st


def test_merge_both_in_state():
    st = _state_with_planes()
    # Merge id 9 into id 5 (nearly identical planes → passes gates).
    mf = jnp.asarray([9, -1, -1, -1], jnp.int32)
    mi = jnp.asarray([5, -1, -1, -1], jnp.int32)
    st2, n = merge_planes(st, mf, mi, 0.1, 1.0, 5.0)
    assert int(n) == 1
    ids = np.asarray(st2.plane_id)
    act = np.asarray(st2.plane_active)
    assert act.tolist() == [True, False, True]
    assert ids[1] == -1
    # Old plane's covariance slot zeroed.
    c = LAY.plane_idx(1)
    assert np.allclose(np.asarray(st2.cov)[c:c + 3, :], 0.0)
    # Surviving plane was nudged toward the merged estimate.
    assert np.linalg.norm(np.asarray(st2.plane_cp[0]) - np.asarray(st.plane_cp[0])) > 1e-6


def test_merge_rename_only():
    st = _state_with_planes()
    # id 7 merges into id 42 which is NOT in the state → rename slot 2.
    mf = jnp.asarray([7, -1], jnp.int32)
    mi = jnp.asarray([42, -1], jnp.int32)
    st2, n = merge_planes(st, mf, mi, 0.1, 1.0, 5.0)
    assert int(n) == 0  # no EKF merge performed
    assert int(st2.plane_id[2]) == 42
    assert bool(st2.plane_active[2])


def test_step_applies_frontend_merges():
    """Runtime wiring (VioManager.cpp:516-533): FrameData merge pairs emitted
    by the frontend must collapse two in-state CP planes inside step() and
    relabel bank features still carrying the merged-away id."""
    import jax.numpy as jnp

    from ov_plane_tpu.models.feature_bank import FeatureBank
    from ov_plane_tpu.models.manager import FrameData, VioEngine, init_state_with_gt, step
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = True
    cfg.state.use_plane_slam_feats = True
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.tpu.max_features = 32
    cfg.tpu.max_obs_per_frame = 16
    cfg.tpu.max_msckf_update = 8
    cfg.tpu.max_imu_per_frame = 16

    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(eng, cfg, t0=0.0, q0=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                               p0=jnp.zeros(3), v0=jnp.zeros(3),
                               bg0=jnp.zeros(3), ba0=jnp.zeros(3))
    # Two nearly identical in-state planes under distinct frontend ids.
    cp0 = jnp.asarray([0.0, 0.0, 2.0])
    cp1 = jnp.asarray([0.0, 0.01, 2.01])
    cov = state.cov.at[jnp.diag_indices(state.cov.shape[0])].add(1e-2)
    state = state.replace(
        cov=cov,
        plane_cp=state.plane_cp.at[0].set(cp0).at[1].set(cp1),
        plane_cp_fej=state.plane_cp_fej.at[0].set(cp0).at[1].set(cp1),
        plane_id=state.plane_id.at[0].set(5).at[1].set(9),
        plane_active=state.plane_active.at[0].set(True).at[1].set(True),
    )

    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    # Give each feature an observation in the last clone column so the
    # clone-slot housekeeping doesn't free the (otherwise empty) slots.
    K = eng.layout.max_clones
    bank = bank.replace(
        fid=bank.fid.at[0].set(100).at[1].set(101),
        planeid=bank.planeid.at[0].set(9).at[1].set(5),
        mask=bank.mask.at[0, K - 1].set(True).at[1, K - 1].set(True),
    )

    n = cfg.tpu.max_imu_per_frame
    ts = jnp.asarray(np.linspace(0.0, 0.1, n))
    frame = FrameData(
        imu_t=ts, imu_w=jnp.zeros((n, 3)),
        imu_a=jnp.asarray(np.tile([0, 0, cfg.gravity_mag], (n, 1))),
        t_new=jnp.asarray(0.1),
        obs_id=jnp.full(16, -1, jnp.int32), obs_uv=jnp.zeros((16, 2)),
        obs_plane=jnp.full(16, -1, jnp.int32),
        merge_from=jnp.asarray([9, -1, -1, -1], jnp.int32),
        merge_into=jnp.asarray([5, -1, -1, -1], jnp.int32),
    )
    state2, bank2, out = step(eng, state, bank, frame)
    assert int(out.n_plane_merges) == 1
    ids = np.asarray(state2.plane_id)
    act = np.asarray(state2.plane_active)
    assert bool(act[0]) and not bool(act[1])
    assert ids[0] == 5 and ids[1] == -1
    # Survivor absorbed the merged plane's information (cp nudged).
    assert np.linalg.norm(np.asarray(state2.plane_cp[0]) - np.asarray(cp0)) > 1e-9
    # Bank features under the old id were relabeled.
    assert int(bank2.planeid[0]) == 5
    assert int(bank2.planeid[1]) == 5


def test_merge_rejects_large_angle():
    st = _state_with_planes()
    # Merge id 7 (orthogonal plane) into id 5: angle gate must reject the
    # update, but the old plane is still marginalized (reference behavior).
    mf = jnp.asarray([7, -1], jnp.int32)
    mi = jnp.asarray([5, -1], jnp.int32)
    st2, n = merge_planes(st, mf, mi, 0.1, 1.0, 5.0)
    assert int(n) == 0
    assert not bool(st2.plane_active[2])
    # Survivor unchanged (no update applied).
    np.testing.assert_allclose(np.asarray(st2.plane_cp[0]), np.asarray(st.plane_cp[0]), atol=1e-12)
