"""VIO engine: the per-frame estimation step and sequence replay.

Functional re-design of ``VioManager`` (core/VioManager.cpp): the reference's
mutable orchestration (feed callbacks, feature DB triage loops, sequential
updater calls — do_feature_propagate_update :330-986) becomes one pure,
jittable ``step(state, bank, frame) -> (state, bank, out)`` plus a
``lax.scan`` replay over a precomputed measurement stream. Monte-Carlo seeds
and sequences batch with ``vmap`` on top.

Triage (VioManager.cpp:375-506) is masked dataflow:

* lost     = active ∧ no obs in the newest clone slot   (features_not_containing_newer)
* marg     = active ∧ obs at the oldest clone slot ∧ window full (features_containing(margtime))
* maxtrack = marg ∧ track length > max_clone_size → SLAM promotion (models/slam.py)
* MSCKF selection = top-(max_msckf_in_update) of (lost ∪ marg ∪ unpromoted
  maxtracks) by track length (VioManager.cpp:603-623), padded to a static M.

Used features are freed from the bank afterwards (to_delete semantics).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.models import feature_bank as fb
from ov_plane_tpu.models.jacobians import JacobianOptions
from ov_plane_tpu.models.msckf import MsckfOptions, msckf_update
from ov_plane_tpu.ops import cams
from ov_plane_tpu.ops.triangulation import TriangulationOptions
from ov_plane_tpu.state.layout import StateLayout
from ov_plane_tpu.state.propagator import (
    PropagatorOptions,
    marginalize_oldest_clone,
    propagate_and_clone,
)
from ov_plane_tpu.state.vio_state import VioState
from ov_plane_tpu.utils.config import VioConfig


class FrameData(NamedTuple):
    """One camera frame's inputs (fixed shapes; the scan xs)."""

    imu_t: jnp.ndarray    # [I] window covering [state.t, t_new]
    imu_w: jnp.ndarray    # [I, 3]
    imu_a: jnp.ndarray    # [I, 3]
    t_new: jnp.ndarray    # scalar
    obs_id: jnp.ndarray   # [O] int32 (-1 pad)
    obs_uv: jnp.ndarray   # [O, 2]
    obs_plane: jnp.ndarray  # [O] int32
    # Optional ground-truth injection (use_groundtruths; zeros otherwise).
    obs_gt_p: jnp.ndarray = None    # [O, 3]
    obs_gt_cp: jnp.ndarray = None   # [O, 3]
    # Optional frame validity (False = padding frame in a batched replay of
    # different-length sequences; the step becomes an identity).
    valid: jnp.ndarray = None       # scalar bool
    # Frontend plane-id merge pairs for this frame (-1 padding): "old id
    # merge_from[q] is now merge_into[q]" (TrackPlane get_plane2oldplane →
    # StateHelper::merge_planes_and_marginalize, VioManager.cpp:516-533).
    merge_from: jnp.ndarray = None  # [Q] int32
    merge_into: jnp.ndarray = None  # [Q] int32


class StepOutput(NamedTuple):
    t: jnp.ndarray
    q: jnp.ndarray          # [4] estimated q_GtoI
    p: jnp.ndarray          # [3]
    v: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    cov_diag_imu: jnp.ndarray  # [15]
    n_msckf_used: jnp.ndarray
    n_clones: jnp.ndarray
    n_bank: jnp.ndarray
    n_slam: jnp.ndarray
    n_planes: jnp.ndarray
    n_slam_init: jnp.ndarray
    n_plane_init: jnp.ndarray
    # Features updated under a point-on-plane constraint this frame (grouped
    # out-of-state path + in-state plane rows) — the reference's
    # "num constraint updates" CSV column.
    n_plane_constraints: jnp.ndarray = None
    # In-state plane pairs collapsed by a frontend id merge this frame.
    n_plane_merges: jnp.ndarray = None
    # Qualifying out-of-state plane groups beyond the static per-frame cap
    # (the reference processes every group; nonzero = parity gap this frame).
    n_plane_dropped: jnp.ndarray = None
    # 3×3 marginal orientation/position covariance blocks — the reference
    # computes NEES from the marginal-BLOCK inverse, not the diagonal
    # (ROS1Visualizer.cpp:850-852); eval.metrics.nees_full consumes these.
    cov_ori_blk: jnp.ndarray = None  # [3,3]
    cov_pos_blk: jnp.ndarray = None  # [3,3]


@dataclass(frozen=True)
class VioEngine:
    """Static (hashable) engine parameters derived from VioConfig."""

    layout: StateLayout
    prop_opts: PropagatorOptions
    msckf_opts: MsckfOptions
    slam_opts: "SlamOptions"
    plane_opts: "PlaneInitOptions"
    plane_msckf_opts: "PlaneMsckfOptions"
    cam_model: int
    max_clone_size: int
    max_msckf_in_update: int
    max_msckf_batch: int       # static M (≥ max_msckf_in_update)
    gravity_mag: float
    sigma_w2: float
    sigma_a2: float
    sigma_wb2: float
    sigma_ab2: float
    min_clones_to_update: int
    max_slam: int
    dt_slam_delay: float
    use_slam: bool
    use_planes: bool
    sigma_plane_merge: float = 0.1
    plane_merge_chi2: float = 1.0
    plane_merge_deg_max: float = 1.0
    try_zupt: bool = False
    zupt_opts: "ZuptOptions" = None
    use_groundtruths: bool = False
    # ArUco SLAM privileges (reference: feature ids ≤ 4*max_aruco_features
    # are never-marginalized SLAM landmarks outside the max_slam budget,
    # StateHelper.cpp:638-652, VioManager.cpp:438-452,484). Ids in
    # [1, aruco_max_id) are the reserved ArUco corner range (frontend/aruco
    # ArucoOptions: id_base + 4*max_markers); 0 disables (sim ids collide
    # with the low range, so this is only set when use_aruco is on — the
    # reference's TrackSIM shifts sim ids past the range for the same reason,
    # VioManager.cpp:226).
    aruco_max_id: int = 0

    @classmethod
    def from_config(cls, cfg: VioConfig) -> "VioEngine":
        from ov_plane_tpu.models.plane_init import PlaneInitOptions
        from ov_plane_tpu.models.plane_msckf import PlaneMsckfOptions
        from ov_plane_tpu.models.slam import SlamOptions
        from ov_plane_tpu.models.zupt import ZuptOptions
        from ov_plane_tpu.ops.planefit import PlaneRefineOptions

        # Landmark representation validation. Reference behavior: every
        # shipped config pins GLOBAL_3D, and VioManager.cpp:823,839 asserts
        # SLAM features are GLOBAL_3D whenever planes are enabled — the same
        # guard applies here. With planes off, both MSCKF features and SLAM
        # landmark STATES may run any 3-dof representation (anchored SLAM
        # states carry per-slot anchors and re-anchor on marginalization).
        from ov_plane_tpu.ops import representations as reps

        rep_msckf = reps.from_name(cfg.state.feat_rep_msckf)  # raises on unknown name
        rep_slam = reps.from_name(cfg.state.feat_rep_slam)
        if cfg.state.use_plane_constraint and rep_slam != reps.GLOBAL_3D:
            raise ValueError(
                "feat_rep_slam must be GLOBAL_3D when plane constraints are on "
                "(reference asserts this, VioManager.cpp:823)")
        if rep_msckf == reps.ANCHORED_INVERSE_DEPTH_SINGLE:
            raise NotImplementedError(
                "ANCHORED_INVERSE_DEPTH_SINGLE is 1-dof and does not fit the "
                "fixed 3-column marginalization layout; use a 3-dof rep")
        if rep_msckf != reps.GLOBAL_3D and cfg.state.use_plane_constraint:
            raise ValueError(
                "feat_rep_msckf must be GLOBAL_3D when plane constraints are "
                "on (reference asserts this, VioManager.cpp:823,839)")
        if rep_slam == reps.ANCHORED_INVERSE_DEPTH_SINGLE:
            raise NotImplementedError(
                "ANCHORED_INVERSE_DEPTH_SINGLE is 1-dof and does not fit the "
                "fixed 3-column landmark layout; use a 3-dof rep")
        # All 3-dof SLAM representations are supported in-state: slam_p holds
        # the rep params, anchored reps carry a per-slot anchor clone and are
        # re-anchored before their anchor marginalizes (slam.change_anchors ≡
        # UpdaterSLAM.cpp:684-850).

        # ArUco corners live OUTSIDE the max_slam budget (never marginalized),
        # so they get their own static landmark slots on top of it.
        aruco_max_id = 0
        n_aruco_slots = 0
        if cfg.use_aruco:
            from ov_plane_tpu.frontend.aruco import ArucoOptions

            ao = ArucoOptions()
            aruco_max_id = ao.id_base + 4 * ao.max_markers
            n_aruco_slots = cfg.tpu.max_aruco_landmarks

        lay = StateLayout(
            max_clones=cfg.state.max_clone_size + 1,  # +1: transient slot between clone and marginalize
            max_slam=max(cfg.state.max_slam_features + n_aruco_slots, 1),
            max_planes=cfg.tpu.max_planes,
            # Disabled calibration states get no error-state columns at all
            # (layout.py): keeps D under the 128-lane TPU tile for the
            # uncalibrated configs instead of carrying 15 dead columns.
            calib_dt=cfg.state.do_calib_camera_timeoffset,
            calib_pose=cfg.state.do_calib_camera_pose,
            calib_intr=cfg.state.do_calib_camera_intrinsics,
        )
        jac = JacobianOptions(
            cam_model=cams.RADTAN if cfg.cam_model == "radtan" else cams.EQUI,
            do_fej=cfg.state.do_fej,
            do_calib_camera_pose=cfg.state.do_calib_camera_pose,
            do_calib_camera_intrinsics=cfg.state.do_calib_camera_intrinsics,
        )
        tri = TriangulationOptions(
            min_dist=cfg.featinit.min_dist,
            max_dist=cfg.featinit.max_dist,
            max_cond=cfg.featinit.max_cond_number,
            refine=cfg.featinit.refine_features,
            max_runs=cfg.featinit.max_runs,
        )
        mo = MsckfOptions(
            jac=jac._replace(rep=rep_msckf), tri=tri,
            sigma_px=cfg.msckf_options.sigma_pix,
            chi2_multipler=cfg.msckf_options.chi2_multipler,
            sigma_c=cfg.state.sigma_constraint,
            use_plane_constraint=cfg.state.use_plane_constraint and cfg.state.use_plane_constraint_msckf,
            use_info_compression=cfg.tpu.use_info_compression,
            shard_axis=cfg.tpu.shard_axis,
        )
        so = SlamOptions(
            jac=jac._replace(rep=rep_slam), tri=tri,
            sigma_px=cfg.slam_options.sigma_pix,
            chi2_multipler=cfg.slam_options.chi2_multipler,
            sigma_c=cfg.state.sigma_constraint,
            use_plane_constraint_slamu=cfg.state.use_plane_constraint and cfg.state.use_plane_constraint_slamu,
            use_plane_constraint_slamd=cfg.state.use_plane_constraint and cfg.state.use_plane_constraint_slamd,
            max_init_per_frame=8,
        )
        po = PlaneInitOptions(
            jac=jac, tri=tri,
            refine=PlaneRefineOptions(
                sigma_px=cfg.msckf_options.sigma_pix, sigma_c=cfg.state.sigma_constraint,
                cauchy_scale=cfg.state.plane_refine_cauchy,
                max_error_threshold=cfg.state.plane_refine_max_error,
                min_inlier_ratio=cfg.state.plane_refine_min_inlier_ratio,
                # sigma_px is in PIXELS; the refine residuals are NORMALIZED
                # coordinates, whitened by focal/sigma_px ≡ the reference's
                # sigma_px_norm (UpdaterMSCKF.cpp:279).
                focal=float(0.5 * (cfg.cam_intrinsics[0] + cfg.cam_intrinsics[1]))),
            sigma_c_adaptive=cfg.tpu.sigma_c_adaptive,
            sigma_px=cfg.msckf_options.sigma_pix,
            sigma_c=cfg.state.sigma_constraint,
            const_init_multi=cfg.state.const_init_multi,
            const_init_chi2=cfg.state.const_init_chi2,
            plane_init_min_feat=cfg.state.plane_init_min_feat,
            plane_init_max_cond=cfg.state.plane_init_max_cond,
            max_msckf_plane=cfg.state.max_msckf_plane,
            use_refine_plane_feat=cfg.state.use_refine_plane_feat,
            use_ransac=cfg.state.use_plane_ransac,
            use_info_compression=cfg.tpu.use_info_compression,
        )
        pmo = PlaneMsckfOptions(
            base=po,
            chi2_multipler=cfg.msckf_options.chi2_multipler,
            plane_msckf_min_feat=cfg.state.plane_msckf_min_feat,
            plane_msckf_max_cond=cfg.state.plane_msckf_max_cond,
            max_planes_per_frame=cfg.tpu.max_planes_per_frame,
        )
        return cls(
            layout=lay,
            plane_msckf_opts=pmo,
            prop_opts=PropagatorOptions(
                use_rk4=cfg.state.use_rk4_integration,
                imu_avg=cfg.state.imu_avg,
                do_fej=cfg.state.do_fej,
                do_calib_camera_timeoffset=cfg.state.do_calib_camera_timeoffset,
            ),
            msckf_opts=mo,
            slam_opts=so,
            plane_opts=po,
            cam_model=jac.cam_model,
            max_clone_size=cfg.state.max_clone_size,
            max_msckf_in_update=cfg.state.max_msckf_in_update,
            max_msckf_batch=max(cfg.tpu.max_msckf_update, cfg.state.max_msckf_in_update),
            gravity_mag=cfg.gravity_mag,
            sigma_w2=cfg.imu_noises.sigma_w_2,
            sigma_a2=cfg.imu_noises.sigma_a_2,
            sigma_wb2=cfg.imu_noises.sigma_wb_2,
            sigma_ab2=cfg.imu_noises.sigma_ab_2,
            min_clones_to_update=min(cfg.state.max_clone_size, 5),
            try_zupt=cfg.try_zupt,
            zupt_opts=ZuptOptions(
                chi2_multipler=max(cfg.zupt_options.chi2_multipler, 1.0),
                noise_multiplier=cfg.zupt_noise_multiplier,
                max_velocity=cfg.zupt_max_velocity,
                max_disparity=cfg.zupt_max_disparity,
                only_at_beginning=cfg.zupt_only_at_beginning,
                integrated_accel=cfg.zupt_integrated_accel,
                explicit_zero_motion=cfg.zupt_explicit_zero_motion,
                sigma_w2=cfg.imu_noises.sigma_w_2,
                sigma_a2=cfg.imu_noises.sigma_a_2,
                sigma_wb2=cfg.imu_noises.sigma_wb_2,
                sigma_ab2=cfg.imu_noises.sigma_ab_2,
                do_fej=cfg.state.do_fej,
                gravity_mag=cfg.gravity_mag,
            ),
            max_slam=cfg.state.max_slam_features,
            dt_slam_delay=2.0,
            use_slam=cfg.state.max_slam_features > 0 or aruco_max_id > 0,
            aruco_max_id=aruco_max_id,
            use_groundtruths=cfg.state.use_groundtruths,
            use_planes=cfg.state.use_plane_constraint and cfg.state.use_plane_slam_feats,
            sigma_plane_merge=cfg.state.sigma_plane_merge,
            plane_merge_chi2=cfg.state.plane_merge_chi2,
            plane_merge_deg_max=cfg.state.plane_merge_deg_max,
        )


def init_state_with_gt(eng: VioEngine, cfg: VioConfig, t0, q0, p0, v0, bg0, ba0, dtype=jnp.float64) -> VioState:
    """Ground-truth initialization (VioManager::initialize_with_gt,
    VioManagerHelper.cpp:46-82): exact mean, fixed diagonal prior."""
    lay = eng.layout
    st = VioState.create(lay, dtype)
    imu = jnp.concatenate([jnp.asarray(q0, dtype), jnp.asarray(p0, dtype), jnp.asarray(v0, dtype),
                           jnp.asarray(bg0, dtype), jnp.asarray(ba0, dtype)])
    cov = jnp.zeros((lay.dim, lay.dim), dtype)
    d = jnp.concatenate([
        jnp.full(3, 0.02**2), jnp.full(3, 0.05**2), jnp.full(3, 0.01**2),
        jnp.full(3, 0.02**2), jnp.full(3, 0.02**2),
    ]).astype(dtype)
    cov = cov.at[:15, :15].set(jnp.diag(d))
    # Calibration priors (State.cpp:86-99); zero covariance keeps a disabled
    # calib state frozen (zero Kalman gain) — the static-layout trick.
    if cfg.state.do_calib_camera_timeoffset:
        cov = cov.at[lay.dt_idx, lay.dt_idx].set(0.01**2)
    if cfg.state.do_calib_camera_pose:
        i = lay.cam_pose_idx
        cov = cov.at[i:i + 3, i:i + 3].set(0.005**2 * jnp.eye(3, dtype=dtype))
        cov = cov.at[i + 3:i + 6, i + 3:i + 6].set(0.01**2 * jnp.eye(3, dtype=dtype))
    if cfg.state.do_calib_camera_intrinsics:
        i = lay.cam_intr_idx
        cov = cov.at[i:i + 4, i:i + 4].set(1.0 * jnp.eye(4, dtype=dtype))
        cov = cov.at[i + 4:i + 8, i + 4:i + 8].set(0.005**2 * jnp.eye(4, dtype=dtype))
    st = st.replace(
        t=jnp.asarray(t0, dtype), startup_t=jnp.asarray(t0, dtype),
        imu=imu, imu_fej=imu, cov=cov,
        calib_cam=jnp.asarray(cfg.cam_extrinsics, dtype),
        cam_zeta=jnp.asarray(cfg.cam_intrinsics, dtype),
        calib_dt=jnp.asarray(cfg.calib_camimu_dt, dtype),
        last_dt=jnp.asarray(cfg.calib_camimu_dt, dtype),
    )
    return st


@functools.partial(jax.jit, static_argnames=("eng",))
def triage(eng: VioEngine, state: VioState, bank: fb.FeatureBank, cur_slot, allow_slam):
    """Feature triage (VioManager.cpp:375-506).

    Returns (sel_idx[M], sel_valid[M], slam_idx[S], slam_valid[S]):
    MSCKF selection (top max_msckf_in_update by track length among
    lost ∪ marg, excluding SLAM promotions) and SLAM promotion candidates
    (max-track features, up to free landmark capacity).
    """
    M = eng.max_msckf_batch
    S = eng.slam_opts.max_init_per_frame
    active = bank.active & ~bank.is_slam
    seen_now = bank.mask[:, cur_slot]
    lost = active & ~seen_now
    marg_slot = state.oldest_clone_slot
    window_full = state.num_clones > eng.max_clone_size
    marg = active & bank.mask[:, marg_slot] & window_full
    nobs = bank.n_obs

    # SLAM promotion: full-window tracks at the marg boundary. ArUco corners
    # (reserved low-id range) are privileged candidates: any aruco track at
    # the marg boundary qualifies (no full-window requirement — the reference
    # collects them via features_containing(margtimestep), VioManager.cpp:
    # 381-384), they outrank natural max-tracks, and landmarks already in the
    # state that are aruco do NOT consume the max_slam budget
    # (VioManager.cpp:438-452: budget = max_slam + curr_aruco_tags).
    maxtrack = marg & (nobs > eng.max_clone_size)
    slam_cand = maxtrack
    budget = jnp.asarray(eng.max_slam, jnp.int32)
    s_bonus = jnp.zeros_like(nobs)
    if eng.aruco_max_id:
        is_aruco = (bank.fid >= 1) & (bank.fid < eng.aruco_max_id)
        slam_cand = maxtrack | (marg & is_aruco & (nobs >= 2))
        s_bonus = jnp.where(is_aruco, 100000, 0)
        slam_is_aruco = ((state.slam_id >= 1) & (state.slam_id < eng.aruco_max_id)
                         & state.slam_active)
        budget = budget + jnp.sum(slam_is_aruco)
    free_cap = budget - jnp.sum(state.slam_active)
    s_score = jnp.where(slam_cand & allow_slam & jnp.asarray(eng.use_slam),
                        nobs + s_bonus, -1)
    s_scores, slam_idx = jax.lax.top_k(s_score, S)
    if eng.aruco_max_id:
        # Aruco candidates bypass the natural budget entirely — the reference
        # appends them to feats_slam with NO size check (VioManager.cpp:
        # 381-384); only natural maxtracks pass through the
        # `size < max_slam + curr_aruco_tags` gate (:448-452). The s_bonus
        # sorts arucos first, so natural rank = position minus #arucos ahead.
        # Everything stays bounded by the physical landmark slots.
        cand_aruco = is_aruco[slam_idx]
        natural_rank = jnp.cumsum(~cand_aruco) - (~cand_aruco).astype(jnp.int32)
        phys_free = state.slam_active.shape[0] - jnp.sum(state.slam_active)
        slam_valid = ((s_scores > 0)
                      & (cand_aruco | (natural_rank < free_cap))
                      & (jnp.arange(S) < phys_free))
    else:
        slam_valid = (s_scores > 0) & (jnp.arange(S) < free_cap)
    # Membership test instead of a scatter (TPU scatters serialize).
    rows = jnp.arange(bank.fid.shape[0])
    promoted = jnp.any((rows[:, None] == slam_idx[None, :]) & slam_valid[None, :], axis=1)

    candidates = (lost | marg) & ~promoted & (nobs >= 2)
    score = jnp.where(candidates, nobs, -1)
    k = min(M, score.shape[0])  # bank may be smaller than the selection batch
    top_scores, sel_idx = jax.lax.top_k(score, k)
    if k < M:
        top_scores = jnp.concatenate([top_scores, jnp.full((M - k,), -1, top_scores.dtype)])
        sel_idx = jnp.concatenate([sel_idx, jnp.zeros((M - k,), sel_idx.dtype)])
    rank_ok = jnp.arange(M) < eng.max_msckf_in_update
    sel_valid = (top_scores >= 2) & rank_ok
    return sel_idx, sel_valid, slam_idx, slam_valid


@functools.partial(jax.jit, static_argnames=("eng",))
def step(eng: VioEngine, state: VioState, bank: fb.FeatureBank, frame: FrameData):
    """One camera frame (do_feature_propagate_update, VioManager.cpp:330-986):

    propagate+clone → ingest → triage → marginalize lost SLAM / unseen planes
    → plane delayed init → MSCKF update (plane-aware) → SLAM update → SLAM
    delayed init → free consumed tracks → marginalize oldest clone.
    """
    from ov_plane_tpu.models.plane_init import marginalize_unseen_planes, plane_delayed_init
    from ov_plane_tpu.models.slam import marginalize_lost_slam, slam_delayed_init, slam_update

    state_in, bank_in = state, bank
    lay = eng.layout
    dtype = state.imu.dtype
    noises = jnp.asarray([eng.sigma_w2, eng.sigma_a2, eng.sigma_wb2, eng.sigma_ab2], dtype)
    gravity = jnp.asarray([0.0, 0.0, eng.gravity_mag], dtype)

    # 0. ZUPT attempt BEFORE propagation (VioManager.cpp:305-313): if the
    #    platform is stationary, update biases/orientation, advance time, and
    #    skip this frame's clone + visual update entirely.
    zupt_accepted = jnp.asarray(False)
    state_zupt = state
    if eng.try_zupt:
        from ov_plane_tpu.models.zupt import try_zupt

        # Image disparity: this frame's observations vs. the newest clone's.
        # Non-finite pixels are masked here with the same hygiene guard as
        # ingest (step 2) — one NaN uv would make avg_disp NaN and silently
        # disable the disparity acceptance path for the frame.
        prev_slot = state.newest_clone_slot
        zupt_finite = jnp.all(jnp.isfinite(frame.obs_uv), axis=1)
        eqz = (frame.obs_id[:, None] == bank.fid[None, :]) & (bank.fid >= 0)[None, :]
        has_m = jnp.any(eqz, axis=1)
        rowz = jnp.argmax(eqz, axis=1)
        both = has_m & bank.mask[rowz, prev_slot] & (frame.obs_id >= 0) & zupt_finite
        dd = jnp.linalg.norm(jnp.where(zupt_finite[:, None], frame.obs_uv, 0.0)
                             - bank.uv[rowz, prev_slot], axis=1)
        n_disp = jnp.sum(both)
        avg_disp = jnp.sum(jnp.where(both, dd, 0.0)) / jnp.maximum(n_disp, 1)

        state_zupt, zupt_ok = try_zupt(
            state, eng.zupt_opts, frame.imu_t, frame.imu_w, frame.imu_a, frame.t_new,
            avg_disp, n_disp,
        )
        allow = ~(jnp.asarray(eng.zupt_opts.only_at_beginning) & state.has_moved)
        zupt_accepted = zupt_ok & allow
    bank_zupt = bank

    # 1. Propagate + stochastic clone into a recycled slot.
    state, new_slot = propagate_and_clone(
        state, frame.imu_t, frame.imu_w, frame.imu_a, frame.t_new, noises, gravity, eng.prop_opts
    )

    if eng.try_zupt and eng.zupt_opts.explicit_zero_motion:
        # Explicit zero-motion variant (UpdaterZeroVelocity.cpp:252-313):
        # reuse this frame's propagate+clone, constrain the relative pose
        # between the previous clone and the transient one (plus velocity) to
        # zero, and free the transient clone. Falls back to the standard
        # formulation's result before the first clone exists.
        from ov_plane_tpu.models.zupt import zupt_explicit_update

        prev_slot0 = state_in.newest_clone_slot
        explicit = zupt_explicit_update(state, eng.zupt_opts, prev_slot0, new_slot)
        has_prev = state_in.num_clones > 0
        state_zupt = jax.tree.map(
            lambda a, b: jnp.where(has_prev, a, b), explicit, state_zupt)

    # 2. Undistort + ingest the frame's observations at the new clone slot.
    #    Non-finite pixels (a corrupt sensor packet, an upstream NaN) are
    #    dropped here — one NaN observation would otherwise poison the whole
    #    stacked update (input-hygiene guard; the reference would assert).
    zeta = state.cam_zeta
    obs_finite = jnp.all(jnp.isfinite(frame.obs_uv), axis=1)
    obs_id = jnp.where(obs_finite, frame.obs_id, -1)
    obs_uv = jnp.where(obs_finite[:, None], frame.obs_uv, 0.0)
    uvn = jax.vmap(lambda uv: cams.undistort(uv, zeta, eng.cam_model))(obs_uv)
    bank = fb.ingest(bank, obs_id, obs_uv, uvn, frame.obs_plane, new_slot,
                     gt_p=frame.obs_gt_p, gt_cp=frame.obs_gt_cp)  # fuses the slot-column clear

    # 3. Triage (masked off until enough clones, VioManager.cpp:355).
    can_update = state.num_clones >= eng.min_clones_to_update
    past_delay = (state.t - state.startup_t) >= eng.dt_slam_delay
    sel_idx, sel_valid, slam_idx, slam_valid = triage(eng, state, bank, new_slot, can_update & past_delay)
    sel_valid = sel_valid & can_update
    slam_valid = slam_valid & can_update

    n_slam_marg = jnp.zeros((), jnp.int32)
    n_plane_init = jnp.zeros((), jnp.int32)
    n_slam_init = jnp.zeros((), jnp.int32)
    n_slam_upd = jnp.zeros((), jnp.int32)

    if eng.use_slam:
        # 4. Marginalize lost SLAM landmarks (StateHelper::marginalize_slam);
        #    aruco landmarks are exempt (never marginalized).
        state, n_slam_marg = marginalize_lost_slam(state, bank, eng.aruco_max_id)

    n_plane_merges = jnp.zeros((), jnp.int32)
    state_preplane, bank_preplane = state, bank
    if eng.use_planes:
        # 5. Plane housekeeping + delayed plane initialization.
        # 5a. Frontend plane-id merges FIRST (VioManager.cpp:516-533 applies
        #     merge_planes_and_marginalize before marginalizing unseen
        #     planes), so a merged-away id's information folds into the
        #     survivor instead of being discarded by the unseen-marginalize.
        if frame.merge_from is not None:
            from ov_plane_tpu.models.plane_init import merge_planes

            state, n_plane_merges = merge_planes(
                state, frame.merge_from, frame.merge_into,
                eng.sigma_plane_merge, eng.plane_merge_chi2, eng.plane_merge_deg_max,
            )
            # Relabel bank features still carrying a merged-away id (the
            # frontend only re-labels features it observed this frame).
            pid = bank.planeid
            for q in range(frame.merge_from.shape[0]):
                f, g = frame.merge_from[q], frame.merge_into[q]
                pid = jnp.where((pid == f) & (f >= 0) & (g >= 0), g, pid)
            bank = bank.replace(planeid=pid)
        marged_state, _ = marginalize_unseen_planes(state, bank, new_slot)
        state = jax.tree.map(lambda a, b: jnp.where(can_update & past_delay, a, b), marged_state, state)
        init_state2, init_bank2, n_plane_init = plane_delayed_init(state, bank, eng.plane_opts, new_slot)
        do_pinit = can_update & past_delay
        state = jax.tree.map(lambda a, b: jnp.where(do_pinit, a, b), init_state2, state)
        bank = jax.tree.map(lambda a, b: jnp.where(do_pinit, a, b), init_bank2, bank)

    # 6a. Grouped MSCKF-plane updates for out-of-state planes
    #     (UpdaterMSCKF plane path; consumes their features).
    sel_valid_main = sel_valid
    n_plane_constraints = jnp.zeros((), jnp.int32)
    n_plane_dropped = jnp.zeros((), jnp.int32)
    if eng.use_planes and eng.msckf_opts.use_plane_constraint:
        from ov_plane_tpu.models.plane_msckf import msckf_plane_update

        pl_state, consumed_sel, _, n_pm_drop = msckf_plane_update(
            state, bank, eng.plane_msckf_opts, sel_idx, sel_valid)
        do_pm = can_update & past_delay
        state = jax.tree.map(lambda a, b: jnp.where(do_pm, a, b), pl_state, state)
        sel_valid_main = sel_valid & ~(consumed_sel & do_pm)
        n_plane_constraints = n_plane_constraints + jnp.sum(consumed_sel & do_pm)
        n_plane_dropped = n_plane_dropped + jnp.where(do_pm, n_pm_drop, 0).astype(jnp.int32)

    if eng.use_planes:
        # f32 poison firewall (round-5 MC campaign: 1/20 ON-arm seeds NaN'd
        # in the room-sparse/lowtex cells): if any plane stage (merge,
        # unseen-marginalize, delayed init, grouped updates) produced a
        # non-finite state, revert this frame's plane stages entirely and
        # fall through to the classic update on the pre-plane state — the
        # in-jit analogue of the reference's fail-fast covariance checks
        # (StateHelper.cpp:108-118 std::exits; a vmapped batch member cannot,
        # so the frame degrades to planes-off instead of poisoning the rest
        # of the replay).
        plane_finite = (jnp.all(jnp.isfinite(state.cov))
                        & jnp.all(jnp.isfinite(state.imu))
                        & jnp.all(jnp.isfinite(
                            jnp.where(state.plane_active[:, None], state.plane_cp, 0.0))))
        state = jax.tree.map(lambda a, b: jnp.where(plane_finite, a, b), state, state_preplane)
        bank = jax.tree.map(lambda a, b: jnp.where(plane_finite, a, b), bank, bank_preplane)
        sel_valid_main = jnp.where(plane_finite, sel_valid_main, sel_valid)
        n_plane_constraints = jnp.where(plane_finite, n_plane_constraints, 0)
        n_plane_init = jnp.where(plane_finite, n_plane_init, 0)
        n_plane_merges = jnp.where(plane_finite, n_plane_merges, 0)

    # 6b. MSCKF update (plane rows for features whose plane is a state).
    sel_uv = bank.uv[sel_idx]
    sel_uvn = bank.uvn[sel_idx]
    sel_mask = bank.mask[sel_idx] & sel_valid_main[:, None]
    sel_pid = bank.planeid[sel_idx]
    peq = (sel_pid[:, None] == state.plane_id[None, :]) & state.plane_active[None, :] & (sel_pid >= 0)[:, None]
    p_in_state = jnp.any(peq, axis=1)
    p_slot = jnp.argmax(peq, axis=1).astype(jnp.int32)
    sel_cp = state.plane_cp[p_slot]
    sel_cp_fej = state.plane_cp_fej[p_slot]
    has_plane = p_in_state  # only in-state planes use rows in this path

    sel_gt_p = bank.gt_p[sel_idx]
    if eng.use_groundtruths:
        # Substitute true plane CPs for on-plane features not in the state
        # (UpdaterMSCKF.cpp:284-302 gt injection).
        sel_cp = jnp.where(has_plane[:, None], bank.gt_cp[sel_idx], sel_cp)
        sel_cp_fej = sel_cp
        has_plane = (sel_pid >= 0)
    new_state, used, _, _ = msckf_update(
        state, eng.msckf_opts, sel_uv, sel_uvn, sel_mask,
        sel_cp, sel_cp_fej, has_plane, p_in_state, p_slot,
        gt_p=sel_gt_p if eng.use_groundtruths else None,
    )
    state = new_state
    if eng.msckf_opts.use_plane_constraint:
        n_plane_constraints = n_plane_constraints + jnp.sum(used & has_plane)

    if eng.use_slam:
        # 7. SLAM landmark update with newest observations.
        upd_state, n_slam_upd = slam_update(state, bank, eng.slam_opts, new_slot)
        state = jax.tree.map(lambda a, b: jnp.where(can_update, a, b), upd_state, state)
        # 8. SLAM delayed init of promoted max-tracks.
        init_state, init_bank, n_slam_init = slam_delayed_init(state, bank, eng.slam_opts, slam_idx, slam_valid)
        state = init_state
        bank = init_bank

    # 9. Free consumed MSCKF rows (to_delete semantics); membership test
    #    instead of a scatter.
    F = bank.fid.shape[0]
    consumed_rows = jnp.any(
        (jnp.arange(F)[:, None] == sel_idx[None, :]) & sel_valid[None, :], axis=1)
    bank = fb.free_rows(bank, consumed_rows)

    # 10. Marginalize the oldest clone if over budget; clear its obs column.
    #     Landmarks anchored at the dying clone re-anchor FIRST
    #     (UpdaterSLAM::change_anchors, called at VioManager.cpp:855-869).
    marg_slot = state.oldest_clone_slot
    over = state.num_clones > eng.max_clone_size
    if eng.use_slam:
        from ov_plane_tpu.ops import representations as _reps

        if _reps.is_anchored(eng.slam_opts.jac.rep):
            from ov_plane_tpu.models.slam import change_anchors

            anch_state, _ = change_anchors(
                state, eng.slam_opts.jac.rep, eng.prop_opts.do_fej,
                marg_slot, state.newest_clone_slot)
            state = jax.tree.map(lambda a, b: jnp.where(over, a, b), anch_state, state)
    state = marginalize_oldest_clone(state, eng.max_clone_size)
    bank_cleared = fb.clear_clone_column(bank, marg_slot)
    bank = jax.tree.map(lambda a, b: jnp.where(over, a, b), bank_cleared, bank)

    # 11. ZUPT select: keep the ZUPT-updated state and the pre-frame bank
    #     (current-frame tracks dropped, UpdaterZeroVelocity.cpp:241-247).
    state = state.replace(has_moved=state.has_moved | ~zupt_accepted)
    if eng.try_zupt:
        state_zupt = state_zupt.replace(has_moved=state.has_moved)
        state = jax.tree.map(lambda a, b: jnp.where(zupt_accepted, a, b), state_zupt, state)
        bank = jax.tree.map(lambda a, b: jnp.where(zupt_accepted, a, b), bank_zupt, bank)
        used = used & ~zupt_accepted

    # 12. Padding-frame select: identity when the frame is invalid.
    if frame.valid is not None:
        state = jax.tree.map(lambda a, b: jnp.where(frame.valid, a, b), state, state_in)
        bank = jax.tree.map(lambda a, b: jnp.where(frame.valid, a, b), bank, bank_in)
        used = used & frame.valid

    out = StepOutput(
        t=state.t, q=state.imu[0:4], p=state.imu[4:7], v=state.imu[7:10],
        bg=state.imu[10:13], ba=state.imu[13:16],
        cov_diag_imu=jnp.diag(state.cov)[:15],
        n_msckf_used=jnp.sum(used & sel_valid),
        n_clones=state.num_clones,
        n_bank=jnp.sum(bank.active),
        n_slam=jnp.sum(state.slam_active),
        n_planes=jnp.sum(state.plane_active),
        n_slam_init=n_slam_init,
        n_plane_init=n_plane_init,
        n_plane_constraints=n_plane_constraints,
        n_plane_merges=n_plane_merges,
        n_plane_dropped=n_plane_dropped,
        cov_ori_blk=state.cov[0:3, 0:3],
        cov_pos_blk=state.cov[3:6, 3:6],
    )
    return state, bank, out


@functools.partial(jax.jit, static_argnames=("eng", "imu_window", "unroll"))
def run_sequence(eng: VioEngine, state: VioState, bank: fb.FeatureBank, sim_data, imu_window: int,
                 unroll: int = 1):
    """Replay a whole simulated sequence under lax.scan (config-1 milestone).

    sim_data: a sim.simulator.SimData. Frame 0 is the initialization frame
    (state must already be initialized at sim_data.cam_t_imu[0]).
    unroll: lax.scan unroll factor — trades compile time/program size for
    less per-step dispatch overhead on the device.
    """
    n_frames = sim_data.cam_t_imu.shape[0]

    def body(carry, i):
        st, bk = carry
        start = sim_data.imu_window_start[i]
        z = jnp.zeros((), start.dtype)
        imu_t = jax.lax.dynamic_slice(sim_data.imu_t, (start,), (imu_window,))
        imu_w = jax.lax.dynamic_slice(sim_data.imu_w, (start, z), (imu_window, 3))
        imu_a = jax.lax.dynamic_slice(sim_data.imu_a, (start, z), (imu_window, 3))
        frame = FrameData(
            imu_t=imu_t, imu_w=imu_w, imu_a=imu_a, t_new=sim_data.cam_t[i],
            obs_id=sim_data.obs_id[i], obs_uv=sim_data.obs_uv[i], obs_plane=sim_data.obs_plane[i],
            obs_gt_p=sim_data.obs_gt_p[i], obs_gt_cp=sim_data.obs_gt_cp[i],
        )
        st, bk, out = step(eng, st, bk, frame)
        return (st, bk), out

    (state, bank), outs = jax.lax.scan(body, (state, bank), jnp.arange(1, n_frames),
                                       unroll=unroll)
    return state, bank, outs
