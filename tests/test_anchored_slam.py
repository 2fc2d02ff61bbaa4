"""Anchored SLAM landmark states + anchor changes (UpdaterSLAM.cpp:684-850).

1. Unit: re-anchoring is information-preserving — the predicted innovation
   covariance and residual of a reprojection measurement are invariant under
   change_anchors (the covariance transform E P Eᵀ matches the new
   parameterization exactly).
2. E2E: a sim replay whose SLAM states run an anchored representation (with
   per-frame anchor changes as clones marginalize) matches the GLOBAL_3D
   replay's accuracy.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.jacobians import JacobianOptions, clone_set_from_state, feature_jacobian_full
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
from ov_plane_tpu.models.slam import _anchor_frames, change_anchors
from ov_plane_tpu.ops import representations as reps
from ov_plane_tpu.ops.quat import quat_2_rot, rot_2_quat
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.state.layout import StateLayout
from ov_plane_tpu.state.vio_state import VioState
from ov_plane_tpu.utils.config import sim_config


def _rand_state(rng, rep, lay):
    st = VioState.create(lay)
    # Three clones along a baseline with small rotations.
    q = []
    p = []
    t = []
    for i in range(3):
        ax = rng.normal(size=3) * 0.05
        R = np.asarray(quat_2_rot(jnp.asarray([*(0.5 * ax), 1.0]) / np.linalg.norm([*(0.5 * ax), 1.0])))
        q.append(np.asarray(rot_2_quat(jnp.asarray(R))))
        p.append(np.asarray([0.3 * i, 0.02 * i, 0.0]))
        t.append(0.1 * (i + 1))
    K = lay.max_clones
    clones_q = np.tile([0.0, 0, 0, 1], (K, 1))
    clones_p = np.zeros((K, 3))
    clones_t = np.full(K, -np.inf)
    clones_q[:3] = q
    clones_p[:3] = p
    clones_t[:3] = t
    st = st.replace(
        t=jnp.asarray(0.3),
        clones_q=jnp.asarray(clones_q), clones_p=jnp.asarray(clones_p),
        clones_q_fej=jnp.asarray(clones_q), clones_p_fej=jnp.asarray(clones_p),
        clones_t=jnp.asarray(clones_t),
        cam_zeta=jnp.asarray([300.0, 300, 160, 120, 0, 0, 0, 0]),
    )
    # One anchored landmark at clone 0, point in front of it.
    p_G = jnp.asarray([0.4, -0.2, 2.0])
    anc, _ = _anchor_frames(st, 0)
    params = reps.params_from_point(rep, anc.point_to_anchor(p_G))
    st = st.replace(
        slam_p=st.slam_p.at[0].set(params),
        slam_p_fej=st.slam_p_fej.at[0].set(params),
        slam_id=st.slam_id.at[0].set(7),
        slam_active=st.slam_active.at[0].set(True),
        slam_anchor_slot=st.slam_anchor_slot.at[0].set(0),
    )
    # Random SPD covariance over the full layout.
    D = lay.dim
    X = rng.normal(size=(D, D)) * 0.02
    st = st.replace(cov=jnp.asarray(X @ X.T + 0.01 * np.eye(D)))
    return st, p_G


@pytest.mark.parametrize("rep_name", ["ANCHORED_3D", "ANCHORED_FULL_INVERSE_DEPTH",
                                      "ANCHORED_MSCKF_INVERSE_DEPTH"])
def test_change_anchors_preserves_innovation(rep_name):
    rep = reps.from_name(rep_name)
    lay = StateLayout(max_clones=4, max_slam=3, max_planes=1,
                      calib_dt=False, calib_pose=False, calib_intr=False)
    rng = np.random.default_rng(1)
    st, p_G = _rand_state(rng, rep, lay)
    jac = JacobianOptions(do_fej=True, rep=rep)

    def meas_rows(state, anchor_slot):
        from ov_plane_tpu.models.slam import _slam_point_global

        p_l, p_l_fej = _slam_point_global(state, rep, 0)
        clones = clone_set_from_state(state)
        obs_mask = jnp.zeros((lay.max_clones,), bool).at[2].set(True)
        uv = jnp.tile(jnp.asarray([200.0, 140.0]), (lay.max_clones, 1))
        H_x, H_f, res, rmask = feature_jacobian_full(
            lay, jac, clones, uv, obs_mask, p_l, p_l_fej,
            jnp.zeros(3), jnp.zeros(3), jnp.asarray(False), jnp.asarray(False),
            jnp.zeros((), jnp.int32), 1.0, 0.05, anchor_slot=anchor_slot,
        )
        # Landmark columns into the slot-0 columns of the full H.
        col = lay.slam_base
        H = H_x.at[:, col:col + 3].add(H_f[:, 0:3])
        return H, res, rmask

    H0, r0, m0 = meas_rows(st, jnp.int32(0))
    S0 = H0 @ st.cov @ H0.T

    st2, n = change_anchors(st, rep, True, jnp.int32(0), jnp.int32(2))
    assert int(n) == 1
    assert int(st2.slam_anchor_slot[0]) == 2
    # The represented global point is unchanged by re-anchoring.
    from ov_plane_tpu.models.slam import _slam_point_global

    p_after, _ = _slam_point_global(st2, rep, 0)
    np.testing.assert_allclose(np.asarray(p_after), np.asarray(p_G), atol=1e-9)

    H1, r1, m1 = meas_rows(st2, jnp.int32(2))
    S1 = H1 @ st2.cov @ H1.T
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=1e-9)
    np.testing.assert_allclose(np.asarray(S1)[m0][:, m0], np.asarray(S0)[m0][:, m0],
                               rtol=1e-6, atol=1e-10)


@pytest.mark.slow
def test_anchored_slam_e2e_matches_global():
    cfg = sim_config()
    cfg.sim.traj_duration = 8.0
    cfg.state.max_slam_features = 10
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 40
    cfg.num_pts_plane = 0
    cfg.tpu.max_features = 96
    cfg.tpu.max_obs_per_frame = 64
    cfg.tpu.max_msckf_update = 24
    sim = build_sim(cfg, max_obs=64)

    def run(rep_name):
        cfg.state.feat_rep_slam = rep_name
        eng = VioEngine.from_config(cfg)
        st = init_state_with_gt(
            eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0],
            v0=sim.gt_v[0], bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0])
        bk = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
        st, _, outs = run_sequence(eng, st, bk, sim, imu_window=cfg.tpu.max_imu_per_frame)
        err = np.asarray(outs.p) - np.asarray(sim.gt_p[1:])
        rmse = float(np.sqrt(np.mean(np.sum(err**2, axis=-1))))
        return rmse, int(np.sum(np.asarray(outs.n_slam_init))), st

    rmse_g, ninit_g, _ = run("GLOBAL_3D")
    rmse_a, ninit_a, st_a = run("ANCHORED_3D")
    rmse_f, ninit_f, _ = run("ANCHORED_FULL_INVERSE_DEPTH")

    assert ninit_g > 0 and ninit_a > 0 and ninit_f > 0
    # Anchored landmarks really live in anchored slots.
    active = np.asarray(st_a.slam_active)
    assert active.any()
    assert (np.asarray(st_a.slam_anchor_slot)[active] >= 0).all()
    # Accuracy parity with GLOBAL_3D (same information, different coordinates).
    assert rmse_a < max(1.5 * rmse_g, rmse_g + 0.02), (rmse_a, rmse_g)
    assert rmse_f < max(1.5 * rmse_g, rmse_g + 0.02), (rmse_f, rmse_g)
    assert rmse_a < 0.2 and rmse_f < 0.2
