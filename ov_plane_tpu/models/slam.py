"""SLAM landmark delayed initialization, update, and marginalization.

Re-design of ``UpdaterSLAM`` (update/UpdaterSLAM.cpp) for GLOBAL_3D landmarks
on the static layout:

* delayed init (:66-374): candidates (max-track features) are processed under
  a bounded ``lax.scan`` — each iteration triangulates one candidate from its
  window observations, QR-splits the stacked system on the landmark columns
  (ops/ekf.qr_init_split), chi2-gates, writes the landmark into a free slam
  slot (initialize_invertible) and applies the leftover-rows update. Masked
  iterations are no-ops, so one compiled program handles 0..S inits per frame.
  When the feature lies on an in-state plane and
  ``use_plane_constraint_slamd`` is set, the point-on-plane rows are included
  (plane columns ride along in H_x) — UpdaterSLAM.cpp:147-202.
* update (:376-682): all tracked landmarks' newest observations are stacked
  into one batched update (2 reprojection rows + optional plane row each),
  with a per-feature chi2 gate; the reference's "drop the plane row and retry
  on chi2 failure" (:547-610) is realized by evaluating both gated variants
  and masking.
* lost landmarks are marginalized (zero slot + free mask), matching
  marginalize_slam (StateHelper.cpp:638-652).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.models import feature_bank as fb
from ov_plane_tpu.models.jacobians import JacobianOptions, clone_set_from_state, feature_jacobian_full
from ov_plane_tpu.ops import ekf
from ov_plane_tpu.ops import representations as reps
from ov_plane_tpu.ops.quat import quat_2_rot
from ov_plane_tpu.ops.triangulation import TriangulationOptions, triangulate
from ov_plane_tpu.state.vio_state import VioState
from ov_plane_tpu.utils.chi2 import CHI2_095_TABLE


class SlamOptions(NamedTuple):
    jac: JacobianOptions = JacobianOptions()
    tri: TriangulationOptions = TriangulationOptions()
    sigma_px: float = 1.0
    chi2_multipler: float = 5.0
    sigma_c: float = 0.05
    use_plane_constraint_slamu: bool = False
    use_plane_constraint_slamd: bool = False
    max_init_per_frame: int = 8


def _anchor_frames(state: VioState, slot):
    """(current, FEJ) AnchorFrame of clone `slot` (anchor = camera frame)."""
    R_ItoC = quat_2_rot(state.calib_cam[0:4])
    p_IinC = state.calib_cam[4:7]
    anc = reps.AnchorFrame(quat_2_rot(state.clones_q[slot]), state.clones_p[slot],
                           R_ItoC, p_IinC)
    anc_fej = reps.AnchorFrame(quat_2_rot(state.clones_q_fej[slot]),
                               state.clones_p_fej[slot], R_ItoC, p_IinC)
    return anc, anc_fej


def _safe_anchor_point(p_A, dtype):
    """Clamp a degenerate anchor-frame point (behind camera / at origin) to a
    unit forward point so inverse-depth params stay finite; degenerate rows
    are gated/rejected downstream (same guard as jacobians._safe_global)."""
    ok = jnp.isfinite(p_A).all() & (p_A[2] > 1e-3) & (jnp.linalg.norm(p_A) > 1e-3)
    return jnp.where(ok, p_A, jnp.asarray([0.0, 0.0, 1.0], dtype)), ok


def _slam_point_global(state: VioState, rep: int, slot_l):
    """(p_FinG, p_FinG_fej) of SLAM landmark `slot_l` from its stored
    representation parameters (Landmark::get_xyz semantics)."""
    params = state.slam_p[slot_l]
    params_fej = state.slam_p_fej[slot_l]
    if rep == reps.GLOBAL_3D:
        return params, params_fej
    if not reps.is_anchored(rep):
        return (reps.point_from_params(rep, params),
                reps.point_from_params(rep, params_fej))
    a = state.slam_anchor_slot[slot_l]
    anc, anc_fej = _anchor_frames(state, jnp.clip(a, 0, state.layout.max_clones - 1))
    return (anc.point_to_global(reps.point_from_params(rep, params)),
            anc_fej.point_to_global(reps.point_from_params(rep, params_fej)))


def _inv3(A):
    """Closed-form 3x3 inverse (no LU — TPU f64-safe)."""
    c00 = A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1]
    c01 = A[1, 2] * A[2, 0] - A[1, 0] * A[2, 2]
    c02 = A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]
    det = A[0, 0] * c00 + A[0, 1] * c01 + A[0, 2] * c02
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    adj = jnp.stack([
        jnp.stack([c00, A[0, 2] * A[2, 1] - A[0, 1] * A[2, 2], A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]]),
        jnp.stack([c01, A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0], A[0, 2] * A[1, 0] - A[0, 0] * A[1, 2]]),
        jnp.stack([c02, A[0, 1] * A[2, 0] - A[0, 0] * A[2, 1], A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]]),
    ])
    return adj / det


def _plane_lookup(state: VioState, planeid):
    """Map a frontend plane id to (in_state, slot, cp, cp_fej)."""
    eq = (state.plane_id == planeid) & state.plane_active & (planeid >= 0)
    in_state = jnp.any(eq)
    slot = jnp.argmax(eq)
    cp = state.plane_cp[slot]
    cp_fej = state.plane_cp_fej[slot]
    return in_state, slot.astype(jnp.int32), cp, cp_fej


@functools.partial(jax.jit, static_argnames=("opts",))
def slam_delayed_init(state: VioState, bank: fb.FeatureBank, opts: SlamOptions,
                      cand_idx, cand_valid):
    """Initialize up to S new SLAM landmarks from bank rows cand_idx.

    cand_idx: [S] bank rows; cand_valid: [S]. Returns (state, bank, n_inited).
    """
    lay = state.layout
    K = lay.max_clones
    D = lay.dim
    dtype = state.imu.dtype
    clone_active = jnp.isfinite(state.clones_t)
    clones = clone_set_from_state(state)
    table = jnp.asarray(CHI2_095_TABLE, dtype)

    def body(carry, s):
        st, bk = carry
        row = cand_idx[s]
        valid = cand_valid[s]
        uv = bk.uv[row]
        uvn = bk.uvn[row]
        mask = bk.mask[row] & clone_active & valid

        # Free slam slot?
        free = ~st.slam_active
        has_free = jnp.any(free)
        slot = jnp.argmax(free).astype(jnp.int32)
        valid = valid & has_free

        # Triangulate this feature (batch of one).
        p_f, tri_ok = triangulate(uvn[None], mask[None], clones.R_GtoC, clones.p_CinG, opts.tri)
        p_f, tri_ok = p_f[0], tri_ok[0]
        valid = valid & tri_ok & (jnp.sum(mask) >= 2)

        planeid = bk.planeid[row]
        in_state, pslot, cp, cp_fej = _plane_lookup(st, planeid)
        use_plane = in_state & (planeid >= 0) & jnp.asarray(opts.use_plane_constraint_slamd)

        # Anchored reps anchor at the newest clone (ov_core: the feature's
        # last observation). Representation params of the triangulated point.
        rep = opts.jac.rep
        anchor = st.newest_clone_slot.astype(jnp.int32)
        if rep == reps.GLOBAL_3D:
            params0 = p_f
        elif not reps.is_anchored(rep):
            params0 = reps.params_from_point(rep, p_f)
        else:
            anc0, _ = _anchor_frames(st, anchor)
            p_A, a_ok = _safe_anchor_point(anc0.point_to_anchor(p_f), dtype)
            params0 = reps.params_from_point(rep, p_A)
            valid = valid & a_ok

        H_x, H_f, res, rmask = feature_jacobian_full(
            lay, opts.jac, clone_set_from_state(st), uv, mask, p_f, p_f, cp, cp_fej,
            use_plane, in_state, pslot, opts.sigma_px, opts.sigma_c,
            anchor_slot=anchor,
        )
        vf = valid.astype(dtype)
        H_x, H_f, res = H_x * vf, H_f * vf, res * vf
        rmask = rmask & valid

        # QR split on the landmark columns.
        HL_i, HR_i, res_i, HR_u, res_u = ekf.qr_init_split(H_f[:, 0:3], H_x, res)

        # chi2 on the update portion (StateHelper::initialize, :463-475).
        n_rows = jnp.sum(rmask)
        chi2 = ekf.innovation_chi2(st.cov, HR_u, res_u, jnp.ones_like(res_u))
        dof = jnp.maximum(n_rows, 1)
        passed = chi2 <= opts.chi2_multipler * table[jnp.clip(dof, 1, table.shape[0] - 1)]
        # Guard invertibility of H_L.
        diag_ok = jnp.all(jnp.abs(jnp.diag(HL_i)) > 1e-8)
        do_init = valid & passed & diag_ok

        slot_col = lay.slam_base + 3 * slot
        new_cov, dx_new = ekf.initialize_invertible(
            st, slot_col, HR_i, HL_i, jnp.ones((3,), dtype), res_i
        )
        # dx_new lives in the representation's error space: add to params.
        p_init = params0 + dx_new
        st_new = st.replace(
            cov=new_cov,
            slam_p=st.slam_p.at[slot].set(p_init),
            slam_p_fej=st.slam_p_fej.at[slot].set(p_init),
            slam_id=st.slam_id.at[slot].set(bk.fid[row]),
            slam_active=st.slam_active.at[slot].set(True),
            slam_anchor_slot=st.slam_anchor_slot.at[slot].set(
                anchor if reps.is_anchored(rep) else jnp.int32(-1)),
        )
        # Leftover-rows EKF update.
        st_upd, _ = ekf.ekf_update(st_new, HR_u, res_u, jnp.ones_like(res_u))
        st_out = jax.tree.map(lambda a, b: jnp.where(do_init, a, b), st_upd, st)

        bk_marked = bk.replace(
            is_slam=bk.is_slam.at[row].set(True),
            slam_slot=bk.slam_slot.at[row].set(slot),
        )
        bk_out = jax.tree.map(lambda a, b: jnp.where(do_init, a, b), bk_marked, bk)
        return (st_out, bk_out), do_init

    (state, bank), inited = jax.lax.scan(body, (state, bank), jnp.arange(opts.max_init_per_frame))
    return state, bank, jnp.sum(inited)


@functools.partial(jax.jit, static_argnames=("opts",))
def slam_update(state: VioState, bank: fb.FeatureBank, opts: SlamOptions, cur_slot):
    """Batched update of all tracked SLAM landmarks with their newest obs.

    For each active landmark: 2 whitened reprojection rows at the current
    clone + optional plane row. Per-feature chi2 gates with the reference's
    plane-drop fallback. One stacked EKF update.
    """
    lay = state.layout
    L = lay.max_slam
    K = lay.max_clones
    D = lay.dim
    dtype = state.imu.dtype
    clones = clone_set_from_state(state)
    table = jnp.asarray(CHI2_095_TABLE, dtype)

    # Match landmarks to bank rows by feature id.
    eq = (state.slam_id[:, None] == bank.fid[None, :]) & (bank.fid >= 0)[None, :]  # [L, F]
    has_row = jnp.any(eq, axis=1)
    rows = jnp.argmax(eq, axis=1)
    seen_now = bank.mask[rows, cur_slot] & has_row
    tracked = state.slam_active & has_row & seen_now

    def per_landmark(slot_l):
        row = rows[slot_l]
        active = tracked[slot_l]
        # Only the newest observation contributes (older ones were consumed).
        obs_mask = jnp.zeros((K,), bool).at[cur_slot].set(active)
        uv = bank.uv[row]
        p_l, p_l_fej = _slam_point_global(state, opts.jac.rep, slot_l)
        planeid = bank.planeid[row]
        in_state, pslot, cp, cp_fej = _plane_lookup(state, planeid)
        use_plane = in_state & (planeid >= 0) & jnp.asarray(opts.use_plane_constraint_slamu)

        H_x, H_f, res, rmask = feature_jacobian_full(
            lay, opts.jac, clones, uv, obs_mask, p_l, p_l_fej, cp, cp_fej,
            use_plane, in_state, pslot, opts.sigma_px, opts.sigma_c,
            anchor_slot=jnp.clip(state.slam_anchor_slot[slot_l], 0, K - 1),
        )
        # Landmark columns: H_f point part goes into the slam slot's columns.
        col = lay.slam_base + 3 * slot_l
        scatter = jax.vmap(
            lambda v: jax.lax.dynamic_update_slice(jnp.zeros((D,), dtype), v, (col,))
        )(H_f[:, 0:3])
        H_x = H_x + scatter
        return H_x, res, rmask, use_plane

    H_all, res_all, rmask_all, used_plane = jax.vmap(per_landmark)(jnp.arange(L))
    # [L, 3K, D] → evaluate per-feature chi2 (with plane rows), fall back to
    # reprojection-only on failure (UpdaterSLAM.cpp:547-610).
    def gate(h, r, rm, slot_l):
        n_rows = jnp.sum(rm)
        chi2 = ekf.innovation_chi2(state.cov, h, r, jnp.ones_like(r))
        dof = jnp.maximum(n_rows, 1)
        return chi2 <= opts.chi2_multipler * table[jnp.clip(dof, 1, table.shape[0] - 1)]

    ok_full = jax.vmap(gate)(H_all, res_all, rmask_all, jnp.arange(L))
    # Plane-drop fallback: mask the plane rows (rows 2K:) and re-gate.
    plane_row_mask = jnp.concatenate([jnp.ones((2 * K,), bool), jnp.zeros((K,), bool)])
    H_nop = H_all * plane_row_mask[None, :, None]
    res_nop = res_all * plane_row_mask[None, :]
    rmask_nop = rmask_all & plane_row_mask[None, :]
    ok_nop = jax.vmap(gate)(H_nop, res_nop, rmask_nop, jnp.arange(L))

    take_full = ok_full & tracked
    take_nop = ~ok_full & ok_nop & tracked
    H_use = jnp.where(take_full[:, None, None], H_all, jnp.where(take_nop[:, None, None], H_nop, 0.0))
    res_use = jnp.where(take_full[:, None], res_all, jnp.where(take_nop[:, None], res_nop, 0.0))

    H_big = H_use.reshape(L * 3 * K, D)
    r_big = res_use.reshape(L * 3 * K)
    H_c, r_c = ekf.measurement_compress(H_big, r_big)
    any_rows = jnp.any(take_full | take_nop)
    dx, new_cov, _ = ekf.kalman_update(state.cov, H_c, r_c, jnp.ones((H_c.shape[0],), dtype))
    new_state = ekf.apply_dx(state.replace(cov=new_cov), dx)
    state = jax.tree.map(lambda a, b: jnp.where(any_rows, a, b), new_state, state)
    return state, jnp.sum(take_full | take_nop)


@functools.partial(jax.jit, static_argnames=("aruco_max_id",))
def marginalize_lost_slam(state: VioState, bank: fb.FeatureBank,
                          aruco_max_id: int = 0):
    """Marginalize landmarks whose track is gone (marginalize_slam,
    StateHelper.cpp:638-652). A landmark is lost when no bank row carries its
    id. ArUco landmarks (ids in [1, aruco_max_id)) are EXEMPT — the reference
    never marginalizes aruco tags (StateHelper.cpp:643: `_featid > 4 *
    max_aruco_features` guards the erase), so a re-detected marker after
    occlusion resumes its landmark."""
    lay = state.layout
    eq = (state.slam_id[:, None] == bank.fid[None, :]) & (bank.fid >= 0)[None, :]
    has_row = jnp.any(eq, axis=1)
    lost = state.slam_active & ~has_row
    if aruco_max_id:
        lost = lost & ~((state.slam_id >= 1) & (state.slam_id < aruco_max_id))

    def zero_one(cov, slot_l):
        return jnp.where(
            lost[slot_l],
            ekf.zero_slot(cov, lay.slam_base + 3 * slot_l, 3),
            cov,
        )

    cov = jax.lax.fori_loop(0, lay.max_slam, lambda i, c: zero_one(c, i), state.cov)
    return state.replace(
        cov=cov,
        slam_active=state.slam_active & ~lost,
        slam_id=jnp.where(lost, -1, state.slam_id),
        slam_anchor_slot=jnp.where(lost, -1, state.slam_anchor_slot),
    ), jnp.sum(lost)


@functools.partial(jax.jit, static_argnames=("rep", "do_fej"))
def change_anchors(state: VioState, rep: int, do_fej: bool, marg_slot, new_slot):
    """Re-anchor landmarks anchored at the about-to-be-marginalized clone
    (UpdaterSLAM::change_anchors / perform_anchor_change,
    UpdaterSLAM.cpp:684-850).

    For each affected landmark the parameters are re-expressed in the newest
    clone's camera frame and the covariance is transformed with the exact
    error-state Jacobian of the re-anchoring map: from the invariance of the
    global point, δf_new = Hf_new⁻¹ (Hf_old δf_old + Ha_old δa_old − Ha_new
    δa_new), where Hf/Ha are the representation Jacobians (d p_G / d params,
    d p_G / d anchor-clone error) on each side — the same quantities the
    reference assembles at :757-835. Applied as one sandwich P ← E P Eᵀ with
    E = I except the affected landmark rows. Returns (state, n_changed).
    """
    lay = state.layout
    L = lay.max_slam
    D = lay.dim
    dtype = state.imu.dtype
    need = state.slam_active & (state.slam_anchor_slot == marg_slot)

    anc_old, anc_old_fej = _anchor_frames(state, marg_slot)
    anc_new, anc_new_fej = _anchor_frames(state, new_slot)

    def per_landmark(slot_l):
        p_G, p_G_fej = _slam_point_global(state, rep, slot_l)
        # New parameters (current and FEJ values re-expressed in the new anchor).
        p_A, ok1 = _safe_anchor_point(anc_new.point_to_anchor(p_G), dtype)
        p_A_fej, ok2 = _safe_anchor_point(anc_new_fej.point_to_anchor(p_G_fej), dtype)
        new_params = reps.params_from_point(rep, p_A)
        new_params_fej = reps.params_from_point(rep, p_A_fej)
        # Error-state Jacobians of both parameterizations of the same point.
        rj_old = reps.rep_jacobians(rep, p_G, p_G_fej, anc_old, anc_old_fej, fej=do_fej)
        rj_new = reps.rep_jacobians(rep, p_G, p_G_fej, anc_new, anc_new_fej, fej=do_fej)
        Hf_new_inv = _inv3(rj_new.H_f)
        Jl = Hf_new_inv @ rj_old.H_f              # [3,3] d f_new / d f_old
        Jao = Hf_new_inv @ rj_old.H_anchor        # [3,6] d f_new / d a_old
        Jan = -Hf_new_inv @ rj_new.H_anchor       # [3,6] d f_new / d a_new
        ok = ok1 & ok2 & jnp.isfinite(Jl).all() & jnp.isfinite(Jao).all() & jnp.isfinite(Jan).all()
        return new_params, new_params_fej, Jl, Jao, Jan, ok

    new_p, new_pf, Jl, Jao, Jan, j_ok = jax.vmap(per_landmark)(jnp.arange(L))
    do = need & j_ok

    # E = I with the affected landmark rows rewritten.
    col_old = lay.clone_base + 6 * marg_slot
    col_new = lay.clone_base + 6 * new_slot
    E = jnp.eye(D, dtype=dtype)

    def write_one(l, Em):
        r = lay.slam_base + 3 * l
        z = jnp.zeros((), jnp.int32)
        sel = do[l]
        blk_l = jnp.where(sel, Jl[l], jnp.eye(3, dtype=dtype))
        Em = jax.lax.dynamic_update_slice(Em, blk_l, (jnp.int32(r), jnp.int32(r)))
        cur_o = jax.lax.dynamic_slice(Em, (jnp.int32(r), col_old.astype(jnp.int32)), (3, 6))
        Em = jax.lax.dynamic_update_slice(
            Em, jnp.where(sel, Jao[l], cur_o), (jnp.int32(r), col_old.astype(jnp.int32)))
        cur_n = jax.lax.dynamic_slice(Em, (jnp.int32(r), col_new.astype(jnp.int32)), (3, 6))
        Em = jax.lax.dynamic_update_slice(
            Em, jnp.where(sel, Jan[l], cur_n), (jnp.int32(r), col_new.astype(jnp.int32)))
        return Em

    E = jax.lax.fori_loop(0, L, write_one, E)
    any_change = jnp.any(do)
    cov_new = E @ state.cov @ E.T
    cov_new = 0.5 * (cov_new + cov_new.T)
    new_state = state.replace(
        cov=jnp.where(any_change, cov_new, state.cov),
        slam_p=jnp.where(do[:, None], new_p, state.slam_p),
        slam_p_fej=jnp.where(do[:, None], new_pf, state.slam_p_fej),
        slam_anchor_slot=jnp.where(do, new_slot.astype(jnp.int32), state.slam_anchor_slot),
    )
    return new_state, jnp.sum(do)
