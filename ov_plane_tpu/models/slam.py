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

        H_x, H_f, res, rmask = feature_jacobian_full(
            lay, opts.jac, clone_set_from_state(st), uv, mask, p_f, p_f, cp, cp_fej,
            use_plane, in_state, pslot, opts.sigma_px, opts.sigma_c,
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
        p_init = p_f + dx_new
        st_new = st.replace(
            cov=new_cov,
            slam_p=st.slam_p.at[slot].set(p_init),
            slam_p_fej=st.slam_p_fej.at[slot].set(p_init),
            slam_id=st.slam_id.at[slot].set(bk.fid[row]),
            slam_active=st.slam_active.at[slot].set(True),
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
        p_l = state.slam_p[slot_l]
        p_l_fej = state.slam_p_fej[slot_l]
        planeid = bank.planeid[row]
        in_state, pslot, cp, cp_fej = _plane_lookup(state, planeid)
        use_plane = in_state & (planeid >= 0) & jnp.asarray(opts.use_plane_constraint_slamu)

        H_x, H_f, res, rmask = feature_jacobian_full(
            lay, opts.jac, clones, uv, obs_mask, p_l, p_l_fej, cp, cp_fej,
            use_plane, in_state, pslot, opts.sigma_px, opts.sigma_c,
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


@jax.jit
def marginalize_lost_slam(state: VioState, bank: fb.FeatureBank):
    """Marginalize landmarks whose track is gone (marginalize_slam,
    StateHelper.cpp:638-652). A landmark is lost when no bank row carries its id."""
    lay = state.layout
    eq = (state.slam_id[:, None] == bank.fid[None, :]) & (bank.fid >= 0)[None, :]
    has_row = jnp.any(eq, axis=1)
    lost = state.slam_active & ~has_row

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
    ), jnp.sum(lost)
